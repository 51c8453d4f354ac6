package graft.storage

import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable
import java.io.{ByteArrayOutputStream, FileNotFoundException, IOException}
import java.net.URI
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

/** In-memory Hadoop FileSystem modeling an S3-class object store —
  * the minimal contract TxTable's commit protocol claims to need:
  *
  *  - `create(overwrite=false)` buffers, and the object appears
  *    ATOMICALLY at `close()` via putIfAbsent — the exact semantics
  *    of a conditional PUT (`If-None-Match: *`). A racer that loses
  *    gets an IOException from close(), never a partial object.
  *  - NO atomic rename: rename is copy-then-delete, and every call is
  *    counted so specs can assert the log protocol never relies on it.
  *  - Flat key space; "directories" exist only as key prefixes.
  *
  * Object bodies and mtimes live in a JVM-wide map (Hadoop caches
  * FileSystem instances per scheme, so state must not be per-instance).
  */
class MemObjectStoreFileSystem extends FileSystem {
  import MemObjectStore._

  private var uri: URI = _
  private var workDir: Path = _

  override def initialize(name: URI, conf: org.apache.hadoop.conf.Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    uri = URI.create(s"$Scheme://${Option(name.getAuthority).getOrElse("store")}")
    workDir = new Path(uri.toString + "/")
  }
  override def getScheme: String = Scheme
  override def getUri: URI = uri
  override def getWorkingDirectory: Path = workDir
  override def setWorkingDirectory(d: Path): Unit = workDir = d

  private def key(p: Path): String = p.toUri.getPath

  override def open(p: Path, bufferSize: Int): FSDataInputStream = {
    val bytes = Option(objects.get(key(p)))
      .getOrElse(throw new FileNotFoundException(p.toString))
    new FSDataInputStream(new SeekableBytes(bytes))
  }

  override def create(p: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    val k = key(p)
    if (!overwrite && objects.containsKey(k))
      throw new FileAlreadyExistsException(p.toString) // fast-path 412
    val buf = new ByteArrayOutputStream() {
      override def close(): Unit = {
        val body = toByteArray
        if (overwrite) { objects.put(k, body); mtimes.put(k, System.currentTimeMillis()) }
        else if (objects.putIfAbsent(k, body) != null)
          throw new IOException(s"conditional PUT failed (412): $p already exists")
        else mtimes.put(k, System.currentTimeMillis())
      }
    }
    new FSDataOutputStream(buf, statistics)
  }

  override def append(p: Path, bufferSize: Int, progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("object stores do not append")

  override def rename(src: Path, dst: Path): Boolean = {
    renames.incrementAndGet()
    val sk = key(src)
    val prefix = sk + "/"
    val hit = objects.containsKey(sk)
    val children = keysWithPrefix(prefix)
    if (!hit && children.isEmpty) return false
    // deliberately non-atomic: copy every key, then delete — a reader
    // can observe both or neither name mid-flight, as on S3
    if (hit) { objects.put(key(dst), objects.get(sk)); mtimes.put(key(dst), System.currentTimeMillis()) }
    children.foreach { k =>
      val nk = key(dst) + "/" + k.stripPrefix(prefix)
      objects.put(nk, objects.get(k)); mtimes.put(nk, System.currentTimeMillis())
    }
    if (hit) { objects.remove(sk); mtimes.remove(sk) }
    children.foreach { k => objects.remove(k); mtimes.remove(k) }
    true
  }

  override def delete(p: Path, recursive: Boolean): Boolean = {
    val k = key(p)
    val children = keysWithPrefix(k + "/")
    if (children.nonEmpty && !recursive)
      throw new IOException(s"non-recursive delete of non-empty prefix $p")
    val hit = objects.containsKey(k)
    objects.remove(k); mtimes.remove(k)
    children.foreach { c => objects.remove(c); mtimes.remove(c) }
    hit || children.nonEmpty
  }

  override def listStatus(p: Path): Array[FileStatus] = {
    val k = key(p)
    if (objects.containsKey(k)) return Array(getFileStatus(p))
    val prefix = if (k.endsWith("/")) k else k + "/"
    val children = keysWithPrefix(prefix)
    if (children.isEmpty) throw new FileNotFoundException(p.toString)
    // immediate children only: files at this depth + implicit subdirs
    val names = children.groupBy(c => c.stripPrefix(prefix).split("/", 2)(0))
    names.map { case (name, ks) =>
      val full = prefix + name
      if (objects.containsKey(full) && ks == Seq(full)) fileStatus(full)
      else dirStatus(full)
    }.toArray
  }

  override def getFileStatus(p: Path): FileStatus = {
    val k = key(p)
    if (objects.containsKey(k)) fileStatus(k)
    else if (keysWithPrefix(k + "/").nonEmpty || k == "/" || k.isEmpty) dirStatus(k)
    else throw new FileNotFoundException(p.toString)
  }

  override def mkdirs(p: Path, permission: FsPermission): Boolean = true // prefixes are implicit

  private def fileStatus(k: String): FileStatus =
    new FileStatus(objects.get(k).length.toLong, false, 1, 4096,
      mtimes.getOrDefault(k, 0L), makeQualified(new Path(k)))
  private def dirStatus(k: String): FileStatus =
    new FileStatus(0L, true, 1, 4096, 0L,
      makeQualified(new Path(if (k.isEmpty) "/" else k)))

  private def keysWithPrefix(prefix: String): Seq[String] = {
    val it = objects.keySet().iterator()
    val out = Seq.newBuilder[String]
    while (it.hasNext) { val k = it.next(); if (k.startsWith(prefix)) out += k }
    out.result()
  }
}

object MemObjectStore {
  val Scheme = "memobj"
  val objects = new ConcurrentHashMap[String, Array[Byte]]()
  val mtimes = new ConcurrentHashMap[String, java.lang.Long]()
  val renames = new AtomicInteger(0)
  def reset(): Unit = { objects.clear(); mtimes.clear(); renames.set(0) }
}

/** Byte-array input stream with the Seekable/PositionedReadable
  * surface FSDataInputStream requires.
  */
private class SeekableBytes(bytes: Array[Byte])
  extends java.io.ByteArrayInputStream(bytes)
  with Seekable with PositionedReadable {
  override def seek(p: Long): Unit = { pos = p.toInt }
  override def getPos: Long = pos.toLong
  override def seekToNewSource(targetPos: Long): Boolean = false
  override def read(position: Long, buffer: Array[Byte], offset: Int, length: Int): Int = {
    if (position >= bytes.length) return -1
    val n = math.min(length, bytes.length - position.toInt)
    System.arraycopy(bytes, position.toInt, buffer, offset, n)
    n
  }
  override def readFully(position: Long, buffer: Array[Byte], offset: Int, length: Int): Unit = {
    if (read(position, buffer, offset, length) < length)
      throw new java.io.EOFException()
  }
  override def readFully(position: Long, buffer: Array[Byte]): Unit =
    readFully(position, buffer, 0, buffer.length)
}
