#!/usr/bin/env python3
"""Single-node throughput comparison: DuckDB (the reference-style
native engine executing the oracle SQL) vs the Spark catalog timings
from graft.Bench.

Usage:
  python3 scripts/bench_compare.py <sfDir> <verifyOutDir> <benchJsonFile>

Writes BENCH_COMPARE.md. DuckDB runs each oracle twice and keeps the
second (warm) time; Spark times come from the bench JSON (one JSON
object line, "queries" map).
"""
import json, os, sys, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, out_dir, bench_file = sys.argv[1], sys.argv[2], sys.argv[3]
    bench = json.loads(open(bench_file).read().strip().splitlines()[-1])
    spark_t = bench["queries"]
    floor = float(bench.get("floor", 0.0))
    canary = float(bench.get("canary", 0.0))
    con = duckdb.connect()
    con.execute(f"PRAGMA threads={os.cpu_count()}")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    # An INTERLEAVED record (graft.tools.InterleavedBench) embeds
    # per-query DuckDB medians taken in the same session, alternating
    # engines per query — use those instead of re-timing, so the
    # per-query ratios and totals are same-box-state by construction.
    duck_embedded = bench.get("duckdbQueries")
    rows = []
    for name in sorted(oracle):
        if duck_embedded is not None:
            best = duck_embedded.get(name)
            if best is None:
                continue
        else:
            best = None
            for _ in range(2):
                t0 = time.time()
                con.execute(oracle[name]).fetchall()
                best = time.time() - t0
        rows.append((name, spark_t.get(name), best))
    kind_note = (
        ["RECORD KIND: **interleaved same-session** — each round ran every",
         "query on BOTH engines back to back (Spark noop sink, then the",
         "DuckDB oracle through a persistent timer subprocess), medians of",
         f"{bench.get('rounds', '?')} warm rounds. Per-query ratios and the",
         "totals below are same-box-state by construction; the ±14%",
         "cross-record canary-normalization error bar (SCALE.md r16) does",
         "not apply WITHIN this record. Cross-round total comparisons",
         "still require matched records.",
         ""] if duck_embedded is not None else [])
    lines = [
        "# BENCH_COMPARE — Spark catalog vs DuckDB oracle (same queries, same parquet)",
        "",
        f"Scale dir: `{sf_dir}` · DuckDB threads: {os.cpu_count()} · "
        f"Spark: local[32] (from `{os.path.basename(bench_file)}`)",
        "",
    ] + kind_note + [
        "Spark numbers include per-query session/planning overhead; `net s`",
        f"subtracts the floor the bench itself measured ({floor:.2f} s: plan +",
        "job scheduling through the same noop sink on a trivial input), so",
        "`net/duckdb` is the plan-vs-plan ratio the per-query rows should be",
        "judged on. DuckDB numbers are warm second runs (its in-process",
        "execution has near-zero fixed cost).",
        "",
        "| query | spark s | net s | duckdb s | spark/duckdb | net/duckdb |",
        "|---|---|---|---|---|---|",
    ]
    s_tot = d_tot = n_tot = 0.0
    kept = []
    for name, s, d in rows:
        if s is None:
            continue
        net = max(s - floor, 0.0)
        s_tot += s
        d_tot += d
        n_tot += net
        kept.append((name, s, net, d))
        ratio = f"{s / d:.1f}x" if d > 0.005 else "nan"
        nratio = f"{net / d:.1f}x" if d > 0.005 else "nan"
        lines.append(f"| {name} | {s:.2f} | {net:.2f} | {d:.2f} | {ratio} | {nratio} |")
    lines.append(f"| **total** | **{s_tot:.2f}** | **{n_tot:.2f}** | **{d_tot:.2f}** | "
                 f"**{s_tot / d_tot:.1f}x** | **{n_tot / d_tot:.1f}x** |")
    k = 1.0
    if duck_embedded is not None:
        lines += [
            "",
            "Canary normalization skipped: interleaved records are "
            "same-box-state within themselves (see the record-kind note).",
        ]
    elif canary > 0.0:
        # Reference canary value + workload tag live in a recorded
        # artifact (scripts/canary_ref.json), not a code literal, so a
        # changed canary workload or reference box cannot silently skew
        # the normalized totals used for cross-round comparison.
        ref = json.load(open(os.path.join(os.path.dirname(__file__),
                                          "canary_ref.json")))
        canary_ref = float(ref["canary_ref"])
        # A record with NO canaryWorkload tag is a mismatch too: only
        # explicitly tagged records may be normalized (an old or
        # hand-edited record must not slip through the guard).
        tag_ok = bench.get("canaryWorkload") == ref["workload"]
        k = canary / canary_ref if tag_ok else 1.0
        lines += [
            "",
            f"Canary (fixed 4M-md5 + 97-key aggregate, median of rounds): "
            f"**{canary:.3f} s** (ref {canary_ref:.2f} s, box factor "
            f"{k:.2f}x) · canary-normalized totals: spark "
            f"**{s_tot / k:.2f} s**, net **{n_tot / k:.2f} s** — use these "
            f"for round-over-round total comparisons.",
        ]
        if not tag_ok:
            lines += [
                "",
                f"**WARNING: canary workload tag mismatch** — record says "
                f"`{bench.get('canaryWorkload')}`, reference artifact is "
                f"`{ref['workload']}`. Normalization DISABLED (box factor "
                f"forced to 1.0); re-record scripts/canary_ref.json from a "
                f"reference run of the new workload.",
            ]
    ann_names, ann_lines = annotations_section(set(spark_t) | set(oracle))
    lines += weak_tail_section(kept, k, ann_names)
    lines += ann_lines
    lines += scaling_section()
    open("BENCH_COMPARE.md", "w").write("\n".join(lines) + "\n")
    print("\n".join(lines))


def weak_tail_section(kept, k, ann_names):
    """THE weak-tail criterion, computed mechanically (round-16 verdict
    item 1: the round-15 hand count said 10, the true count was 12).
    A query is weak iff its canary-normalized net time is >= 0.9 s AND
    > 2x its DuckDB oracle. SCALE.md weak counts must cite this section
    rather than a hand-maintained list."""
    weak = []
    for name, s, net, d in kept:
        nn = net / k
        if nn >= 0.9 and d > 0.005 and nn / d > 2.0:
            weak.append((name, nn, nn / d, name in ann_names))
    weak.sort(key=lambda w: -w[2])
    lines = [
        "",
        f"## Weak tail (mechanical): {len(weak)} queries",
        "",
        "Criterion: canary-normalized net >= 0.9 s AND > 2x the per-query",
        f"DuckDB oracle, at box factor {k:.2f}x. 'annotated' = the query is",
        "named in a ratio annotation below explaining why the ratio is a",
        "design property; an unannotated member is an open perf item.",
        "",
        "| query | norm net s | norm net / duckdb | annotated |",
        "|---|---|---|---|",
    ]
    for name, nn, r, ann in weak:
        lines.append(f"| {name} | {nn:.2f} | {r:.1f}x | "
                     f"{'yes' if ann else '**NO**'} |")
    return lines


def annotations_section(known_names):
    """Per-query context for rows whose ratio is a DESIGN property of
    the fixture or an audit twin, not a plan defect — so a >2x row
    doesn't read as an unexplained regression. Returns (names, lines):
    `names` is the union of each annotation's EXPLICIT covers list (the
    second tuple element), which the weak-tail section uses for its
    annotated flag — a regex over titles would silently miss a query
    explained in a note body or flip on a rename. Any covered name not
    in `known_names` (the bench/oracle query set) emits a warning line
    so a renamed query can't leave a stale annotation looking green."""
    notes = [
        ("ts_sliding_heavy / ts_sliding_heavy_ss / "
         "ts_sliding_heavy_skew / ts_sliding_heavy_skew_exact",
         ["ts_sliding_heavy", "ts_sliding_heavy_ss",
          "ts_sliding_heavy_skew", "ts_sliding_heavy_skew_exact"],
         "deliberate worst case: the events fixture is NEAR-UNIFORM "
         "(every user ~equal activity), the regime where SpaceSaving "
         "summaries (…_ss) degrade to their m*hours bound and the exact "
         "audit twin (…_heavy) pays the full (user,hour)x24 fold. The "
         "design targets skewed 100 TB streams (users >> m*24), where "
         "the bounded summaries win by construction; the exact twin "
         "exists as the audit gate, not the scale path. Since round 17 "
         "the design regime is ORACLE-GATED, not probe-only: "
         "ts_sliding_heavy_skew runs the same summary pipeline on a "
         "deterministic Zipfian fixture (~90k users >> m*24), "
         "ts_sliding_heavy_skew_exact is its exact audit twin, both "
         "hash-green, and interleaved warm medians (PairBench, 7 "
         "rounds, sf0.1) read summary 1.56 s vs exact 2.30 s — the "
         "summaries win 1.47x in-regime with the gap growing in the "
         "user axis. The skew pair's own sf0.1 ratios price the "
         "shared fixture synthesis (an events scan + a 432k-row "
         "head cross join) plus the audit twin's deliberate full "
         "fold; 10x user-axis exponents in the scaling table below "
         "price the growth."),
        ("llm_margin_mine",
         ["llm_margin_mine"],
         "the deliberate exact AxB form kept as the audit twin of "
         "llm_margin_mine_cells (the IVF-bounded scale path); the "
         "two-branch plan was A/B'd against chaining (2.08 vs 2.78 s) "
         "and kept."),
        ("llm_incremental_dedup",
         ["llm_incremental_dedup"],
         "one TxTable commit + (second increment) two index folds per "
         "increment = the commit-protocol floor (IncDedupProbe2/4: "
         "index folds hide under the batch kernel via Futures; residual "
         "is minhash kernel CPU + commit IO). Round 15 cut 3.5->2.65 s "
         "(fused verify filter, payload digest, prepared kernels, "
         "knownParts commit); round 16 replaced the explode+aggregate "
         "signature kernel with the native MinHashSig expression "
         "(value-identical md5x2-slice32; kernel A/B 1.43x, full query "
         "1.19x interleaved) — the residual is now the serialized "
         "TxTable commit-protocol jobs (IncDedupProbe4 r16: kernels "
         "~1.2 s of a 3.7 s wall, then ~20 one-task protocol jobs). "
         "The stored side reads with zero Exchange — the 100 TB "
         "property the ratio at sf0.1 doesn't show."),
        ("llm_kmv_setops / llm_minhash_error",
         ["llm_kmv_setops", "llm_minhash_error"],
         "sketch-CALIBRATION audit twins: each computes the exact "
         "answer (distinct-gram self-join intersection / exact Jaccard "
         "over shingle sets) NEXT TO the sketch estimate, so the "
         "measured cost and the 0.653 10x exponent belong to the exact "
         "audit columns, not the sketch algebra. llm_kmv_sketch is the "
         "split-out sketch-only path (round 15): same pairs, estimates "
         "only, O(sources*k) after one corpus pass — its row is the "
         "price a 100 TB deployment pays. llm_minhash_lsh already "
         "prices the sketch-only near-dup path for minhash."),
        ("ts_mfi / ts_cmf / ts_amihud / ts_kyle_lambda / ts_beta / "
         "ts_rolling_beta (hourly-indicator family)",
         ["ts_mfi", "ts_cmf", "ts_amihud", "ts_kyle_lambda",
          "ts_beta", "ts_rolling_beta"],
         "the events fixture at sf0.1 is 100k rows / ~1.5 MB: DuckDB "
         "finishes in 0.05-0.08 s single-process while the Spark side "
         "pays a fixed ~0.5 s session floor (ts_rsi, the family's "
         "simplest member, prices it) plus the props-JSON parse for "
         "the volume-carrying members. The plans are one keyed "
         "exchange + streaming window (ExplainAudit); the double-"
         "compute defects that were real (ts_vpoc, ts_hurst) were "
         "fixed in round 14 via IndAbProbe (1.61->0.95, 2.39->0.99 s)."),
        ("llm_allpairs_sim",
         ["llm_allpairs_sim"],
         "the prefix-filtered scale path priced against DuckDB's "
         "in-process brute force: at sf0.1 the full token self-join is "
         "only 4.0M pairs so the oracle wins on fixed cost, while the "
         "Spark plan's candidate volume is Sigma pref*df = 0.69M and "
         "grows 10x-exponent 0.341 (SCALING.json) - the shape that "
         "survives a hot token at 100 TB where Sigma df^2 does not."),
        ("llm_tfidf / llm_rrf_fusion / ts_funnel / llm_source_overlap",
         ["llm_tfidf", "llm_rrf_fusion", "ts_funnel", "llm_source_overlap"],
         "sub-1.1 s stage-wave floors surfaced by the r16 mechanical "
         "weak list (membership near the 0.9 s line wobbles with "
         "DuckDB re-timing noise). RecomputeScan r16: tfidf 12 jobs / "
         "one heavy (the tf kernel, checkpointed once), rrf_fusion 14 "
         "jobs / one heavy (BM25 rank waves + cosine top-k + fusion "
         "join over model-sized frames), ts_funnel 5 jobs with NO "
         "heavy job at all (pure scheduling floor over a 1.5 MB "
         "events fixture - the ts_rsi story), source_overlap one "
         "kernel + the pair matrix (its twin final-aggregation jobs "
         "were fixed r16 with a source-set checkpoint: wall-neutral "
         "at sf0.1 - the twins ran concurrently - but single-pass in "
         "CPU, the property that matters on a busy cluster). DuckDB "
         "folds each into one in-process pass over ~1 MB."),
        ("llm_components_chain / llm_label_prop / llm_pagerank / llm_hits",
         ["llm_components_chain", "llm_label_prop", "llm_pagerank", "llm_hits"],
         "iterative graph shapes: a FIXED iteration count (4 "
         "min-label-propagation rounds / power iterations), each "
         "iteration a join+aggregate pair of jobs with "
         "localCheckpoint-bounded lineage — the sf0.1 wall is "
         "iterations x per-job floor while DuckDB runs one in-process "
         "recursive pass over the ~500-edge fixture (components_chain "
         "oracle 0.09 s). The per-iteration frames are edge-sized and "
         "the round count is fixture-pinned by the oracle; SCALING "
         "exponents 0.2-0.44 price the corpus growth."),
        ("llm_embed_neardup / llm_dsir / llm_clean_corpus / "
         "llm_abtt_topk / llm_embed_outliers / llm_kmv_sketch",
         ["llm_embed_neardup", "llm_dsir", "llm_clean_corpus",
          "llm_abtt_topk", "llm_embed_outliers", "llm_kmv_sketch"],
         "recurring BOUNDARY members: 0.9-1.8 s net at 2.0-3.4x, "
         "entering and leaving the mechanical list with record noise "
         "(16 -> 9 -> 22 members across three same-day r16 records as "
         "box factor and DuckDB warm times moved). Each is a measured "
         "stage-wave floor, not an open defect: abtt_topk's r14 'fan "
         "regression' was proven box drift (SPARK_GRAFT_NO_FANOUT "
         "A/B, r15); dsir's aggregation was fused r15; kmv_sketch IS "
         "the sketch-only scale path (exponent 0.077); clean_corpus "
         "is one native-expression pass + the JSONL sink; the embed "
         "pair are cell-local ANN shapes with exponents 0.05-0.33."),
        ("llm_retrieval_eval / llm_stupid_backoff / llm_kn_lm",
         ["llm_retrieval_eval", "llm_stupid_backoff", "llm_kn_lm"],
         "kn_lm-class stage-wave floors: multi-join scoring chains over "
         "model-sized frames (BM25 rank join waves; the trigram backoff "
         "chain's five gram joins - broadcast/checkpoint A/Bs recorded "
         "as washes in SCALE.md round 14). 10x exponents 0.203 / 0.286 "
         "price the scaling; the sf0.1 ratio prices the session floor."),
        ("ts_sliding_distinct",
         ["ts_sliding_distinct"],
         "same fixture worst case as the heavy twins: the 24x explode "
         "through two exchanges is the exact-audit cost; fanOut was "
         "A/B'd and REJECTED for the family (SCALE.md round 14c), and "
         "the countDistinct-vs-pair-distinct A/B was a wash (SdAbProbe)."),
        ("llm_semantic_pack / llm_margin_mine_cells",
         ["llm_semantic_pack", "llm_margin_mine_cells"],
         "iterative k-means shapes: semanticOrder / cellMarginMine run "
         "a fixed Lloyd fit (5 / 3 iterations = 2 jobs each: assign "
         "aggregate + centroid collect) before the cell-local work, "
         "and packSequences adds its two-level prefix-sum actions — "
         "~20-30 small jobs whose per-job floor IS the sf0.1 wall "
         "(IncDedupProbe4 r15: no job over 0.4 s, no single-task "
         "CPU-dense stage). The iteration count is fixture-pinned by "
         "the oracle; the per-iteration frames are model/cell-sized, "
         "so the shape is corpus-size-independent past the one "
         "assign pass per iteration."),
        ("llm_containment",
         ["llm_containment"],
         "posting-join floor after two real fixes: r15 df-as-window "
         "killed the double kernel (1.83->1.54 interleaved), and the "
         "r16 follow-ups were A/B-REJECTED (numbered repartition on "
         "the digest: 1.65 vs 1.23 s — AQE's 8-task coalescing of the "
         "byte-small posting stages WINS at this size; per-job cpuMs "
         "said otherwise but inflates ~10x under contention). "
         "IncDedupProbe4: kernel 0.5 s + broadcast pair-join and nA "
         "running concurrently + ~11 AQE stage-jobs of driver floor "
         "vs DuckDB's one in-process pass over a 1.5 MB corpus; 10x "
         "exponent 0.40 (SCALING.json) prices the scale path."),
        ("llm_repetition",
         ["llm_repetition"],
         "one eager-checkpointed tokenize kernel feeding the doc "
         "stats + top-word and top-bigram min_by aggregations — "
         "IncDedupProbe4 r16: the two explode+agg consumers run "
         "CONCURRENTLY (0.34 / 0.64 s overlapping jobs), so fusing "
         "them saves no wall; the ~2x ratio is the 12-job AQE "
         "stage-wave floor over a corpus DuckDB folds in-process. "
         "The r15 fix (3x tokenize -> 1) is what brought it this "
         "close to the line."),
        ("llm_bm25 / ts_corr_topk / ts_sma10 / llm_unigram_train "
         "(slow-window boundary members)",
         ["llm_bm25", "ts_corr_topk", "ts_sma10", "llm_unigram_train",
          "llm_heaps_law", "llm_collocations", "llm_hll_distinct"],
         "0.9-1.4 s nets that cross the weak line only on slower box "
         "windows: the two same-session r17 interleaved records (same "
         "code for all four) read bm25 0.69->1.05, corr_topk "
         "0.73->1.04, sma10 0.82->1.02, unigram_train 0.83->0.99 s as "
         "the record total drifted 149->162 s — and their DuckDB "
         "oracles drifted the same direction. The r17e end-of-round "
         "record (floor 0.07->0.105 s, DuckDB total 227->294 s: a "
         "~30% slower window, same plans) pushed three more of the "
         "same class over the line (heaps_law 0.76->1.03, "
         "collocations 0.59->0.91, hll_distinct 0.92->1.38 net) while "
         "bm25/corr_topk/sma10 dropped back OUT — the memberships "
         "are window artifacts, the plans did not change. "
         "Stage-wave floors over "
         "~1-2 MB fixtures (the llm_repetition class), not plan "
         "defects; membership near the 0.9 s line wobbles with box "
         "state (the r16 lesson that made this list mechanical)."),
        ("llm_line_scrub",
         ["llm_line_scrub"],
         "pays a deliberate ~0.2 s local wall for deterministic "
         "single-pass CPU: CheckpointRaceSpec r17 caught the lazy "
         "line-digest checkpoint racing (both consumers computed the "
         "posexplode+md5 kernel), and the eager form serializes the "
         "materialization the race used to hide on idle cores "
         "(alternating PairBench arms: lazy 1.42/1.27/1.24 vs eager "
         "1.61/1.69/1.43 s). On a busy cluster the race is a full "
         "second kernel execution of real CPU; the structural "
         "alternatives (df-window, no checkpoint) are strictly worse "
         "at the 10^8-doc hot-line scale the operator is shaped "
         "for."),
        ("llm_unigram_encode / llm_unigram_apply",
         ["llm_unigram_encode", "llm_unigram_apply"],
         "llm_unigram_encode deliberately trains IN-QUERY (2 hard-EM "
         "rounds, ~6 engine job waves) so the oracle pins the fit; "
         "the deployed cost is the llm_unigram_apply row, which "
         "encodes under a train-once cached vocabulary (the "
         "llm_ivf_pq_probe lifecycle) against the SAME oracle SQL. "
         "PairBench r17 (5 warm rounds, sf0.1): apply 0.81 s vs "
         "encode 1.57 s — the fit is half the encode row's wall, and "
         "the apply row sits ~1.5x its oracle (out of the weak "
         "tail)."),
        ("llm_nb_classify / llm_log_odds",
         ["llm_nb_classify", "llm_log_odds"],
         "5000-doc / 1.5 MB fixtures: the Spark time is ~7 sequential "
         "stage waves of fixed cost (SCALE.md round 14); 10x exponents "
         "0.248 / 0.299 show the shape scales while the sf0.1 ratio "
         "prices the session floor."),
    ]
    lines = ["", "## Ratio annotations (design properties, not defects)", ""]
    names = set()
    unknown = []
    for name, covers, note in notes:
        names.update(covers)
        unknown += [c for c in covers if c not in known_names]
        lines.append(f"- **{name}** — {note}")
    if unknown:
        lines += ["",
                  f"**WARNING: annotations cover unknown queries** (stale "
                  f"after a rename/removal?): {', '.join(sorted(unknown))}"]
    return names, lines


def scaling_section():
    """Two-SF scaling table from SCALING.json (refreshed MANUALLY by
    copying the one-line JSON that `Test/runMain graft.tools.ScaleBench`
    prints to stdout — the tool does not write the file itself, so a
    perf change only lands here once that line is re-captured; written by
    `Test/runMain graft.tools.ScaleBench`), appended so bench
    regeneration never drops the scale-proof."""
    if not os.path.exists("SCALING.json"):
        return []
    s = json.load(open("SCALING.json"))
    f = s["factor"]
    lines = [
        "",
        f"## Two-SF scaling — heavy queries at sf0.1 vs a {f}x corpus",
        "",
        f"`graft.tools.ScaleBench` replicates sf0.1 documents/embeddings {f}x",
        "(per-replica Caesar-rotated text and sign-flipped embeddings: within-",
        "replica dup/similarity structure exact, cross-replica overlap none, so",
        "detector work grows linearly like genuinely new data). Exponent =",
        f"log_{f}(t_{f}x / t_1x); a bucket-local plan stays ≤ ~1; the",
        "sub-1 values reflect the 32-core headroom sf0.1 leaves idle plus the",
        "constant session floor.",
        "",
        f"| query | t(sf0.1) s | t({f}x) s | ratio | exponent |",
        "|---|---|---|---|---|",
    ]
    for name, q in sorted(s["queries"].items()):
        lines.append(f"| {name} | {q['t1']:.2f} | {q['tN']:.2f} "
                     f"| {q['ratio']:.2f}x | {q['exponent']:.2f} |")
    return lines


if __name__ == "__main__":
    main()
