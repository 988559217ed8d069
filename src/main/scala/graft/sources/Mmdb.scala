package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import scala.collection.mutable

/** Clean-room reader for the MaxMind DB ("mmdb") binary format, spec
  * version 2.0 (public spec: maxmind.github.io/MaxMind-DB). Implements
  * exactly what the offline geo-dim export needs: metadata decode, the
  * binary search tree walk, and the data-section type system — enough
  * to turn a City or ASN database into the disjoint
  * (start_ip, end_ip, country, city, asn, as_name) CSV that
  * [[Dims.loadGeo]] broadcasts (the reference keeps the mmdb on every
  * worker and resolves per row, App.java:258-266,409-420; the engine
  * resolves once per RANGE offline and range-joins).
  *
  * Driver/offline-side by design: dims are broadcast-scale (O(1M)
  * ranges), so the export is a one-off file walk, not a Spark job.
  */
object Mmdb {

  final case class Metadata(nodeCount: Int, recordSize: Int,
                            ipVersion: Int, databaseType: String)

  /** One exported network: [start, end] inclusive IPv4 bounds plus the
    * decoded data-section record for its leaf. */
  final case class Range(start: Long, end: Long, data: Any)

  private val MetadataMarker: Array[Byte] =
    Array(0xAB.toByte, 0xCD.toByte, 0xEF.toByte) ++
      "MaxMind.com".getBytes("US-ASCII")

  def read(path: String): MmdbFile = {
    val bytes = Files.readAllBytes(Paths.get(path))
    new MmdbFile(bytes)
  }

  /** A parsed mmdb image. Not thread-safe (single-pass export tool). */
  final class MmdbFile(bytes: Array[Byte]) {
    private val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)

    val metadata: Metadata = {
      val at = lastIndexOfMarker()
      require(at >= 0, "not an mmdb file: metadata marker missing")
      val m = decodeAt(at + MetadataMarker.length, at + MetadataMarker.length)
        .asInstanceOf[Map[String, Any]]
      Metadata(
        nodeCount = m("node_count").asInstanceOf[Long].toInt,
        recordSize = m("record_size").asInstanceOf[Long].toInt,
        ipVersion = m("ip_version").asInstanceOf[Long].toInt,
        databaseType = m.getOrElse("database_type", "").asInstanceOf[String])
    }

    private val nodeBytes = metadata.recordSize * 2 / 8
    private val treeSize = metadata.nodeCount.toLong * nodeBytes
    /** Absolute offset of the data section (after the 16-byte
      * separator); record values encode node_count + 16 + data offset,
      * so pointers resolve as (value - node_count) + treeSize. */
    private val dataStart = treeSize + 16

    private def lastIndexOfMarker(): Int = {
      // the marker may legally also appear in data; the LAST match wins
      var i = bytes.length - MetadataMarker.length
      while (i >= 0) {
        var j = 0
        while (j < MetadataMarker.length && bytes(i + j) == MetadataMarker(j))
          j += 1
        if (j == MetadataMarker.length) return i
        i -= 1
      }
      -1
    }

    /** Record `side` (0 = left/bit 0, 1 = right/bit 1) of tree node. */
    private[sources] def record(node: Int, side: Int): Int = {
      val base = node * nodeBytes
      metadata.recordSize match {
        case 24 =>
          val o = base + side * 3
          ((bytes(o) & 0xFF) << 16) | ((bytes(o + 1) & 0xFF) << 8) |
            (bytes(o + 2) & 0xFF)
        case 28 =>
          val mid = bytes(base + 3) & 0xFF
          if (side == 0)
            ((mid >>> 4) << 24) | ((bytes(base) & 0xFF) << 16) |
              ((bytes(base + 1) & 0xFF) << 8) | (bytes(base + 2) & 0xFF)
          else
            ((mid & 0xF) << 24) | ((bytes(base + 4) & 0xFF) << 16) |
              ((bytes(base + 5) & 0xFF) << 8) | (bytes(base + 6) & 0xFF)
        case 32 =>
          buf.getInt(base + side * 4)
        case other =>
          throw new IllegalArgumentException(s"record_size $other")
      }
    }

    /** Decode the data-section value a tree record points to. */
    private def dataAt(recordValue: Int): Any = {
      val abs = (recordValue - metadata.nodeCount).toLong + treeSize
      decodeAt(abs.toInt, dataStart.toInt)
    }

    // ---- data section decoding (spec §"Data Section") ----

    /** Decode the value at absolute offset `at`; `sectionStart` anchors
      * pointer resolution (data section for tree data, metadata start
      * for the metadata map — the spec scopes pointers to their own
      * section). */
    private def decodeAt(at: Int, sectionStart: Int): Any = {
      val (v, _) = decode(at, sectionStart)
      v
    }

    private def decode(at: Int, sectionStart: Int): (Any, Int) = {
      val ctrl = bytes(at) & 0xFF
      var typ = ctrl >>> 5
      var p = at + 1
      if (typ == 0) { // extended type
        typ = (bytes(p) & 0xFF) + 7
        p += 1
      }
      if (typ == 1) { // pointer — size bits encode width, not length
        val ss = (ctrl >>> 3) & 0x3
        val vbits = ctrl & 0x7
        var value = 0L
        ss match {
          case 0 =>
            value = (vbits.toLong << 8) | (bytes(p) & 0xFF); p += 1
          case 1 =>
            value = (vbits.toLong << 16) | ((bytes(p) & 0xFF) << 8) |
              (bytes(p + 1) & 0xFF); value += 2048; p += 2
          case 2 =>
            value = (vbits.toLong << 24) | ((bytes(p) & 0xFF) << 16) |
              ((bytes(p + 1) & 0xFF) << 8) | (bytes(p + 2) & 0xFF)
            value += 526336; p += 3
          case _ =>
            value = ((bytes(p) & 0xFF).toLong << 24) |
              ((bytes(p + 1) & 0xFF) << 16) |
              ((bytes(p + 2) & 0xFF) << 8) | (bytes(p + 3) & 0xFF)
            p += 4
        }
        val (v, _) = decode(sectionStart + value.toInt, sectionStart)
        return (v, p)
      }
      var size = ctrl & 0x1F
      if (size == 29) { size = 29 + (bytes(p) & 0xFF); p += 1 }
      else if (size == 30) {
        size = 285 + (((bytes(p) & 0xFF) << 8) | (bytes(p + 1) & 0xFF))
        p += 2
      } else if (size == 31) {
        size = 65821 + (((bytes(p) & 0xFF) << 16) |
          ((bytes(p + 1) & 0xFF) << 8) | (bytes(p + 2) & 0xFF))
        p += 3
      }
      typ match {
        case 2 => // UTF-8 string
          (new String(bytes, p, size, "UTF-8"), p + size)
        case 3 => // double
          (buf.getDouble(p), p + 8)
        case 4 => // bytes
          (java.util.Arrays.copyOfRange(bytes, p, p + size), p + size)
        case 5 | 6 | 9 => // uint16 / uint32 / uint64 (as Long)
          var v = 0L
          var i = 0
          while (i < size) { v = (v << 8) | (bytes(p + i) & 0xFF); i += 1 }
          (v, p + size)
        case 7 => // map
          var m = Map.empty[String, Any]
          var q = p
          var i = 0
          while (i < size) {
            val (k, q1) = decode(q, sectionStart)
            val (v, q2) = decode(q1, sectionStart)
            m += (k.asInstanceOf[String] -> v)
            q = q2
            i += 1
          }
          (m, q)
        case 8 => // int32
          var v = 0
          var i = 0
          while (i < size) { v = (v << 8) | (bytes(p + i) & 0xFF); i += 1 }
          (v.toLong, p + size)
        case 10 => // uint128 — surfaced as BigInt
          (BigInt(1, java.util.Arrays.copyOfRange(bytes, p, p + size)),
            p + size)
        case 11 => // array
          var out = Vector.empty[Any]
          var q = p
          var i = 0
          while (i < size) {
            val (v, q1) = decode(q, sectionStart)
            out :+= v
            q = q1
            i += 1
          }
          (out, q)
        case 14 => // boolean: size IS the value
          (size != 0, p)
        case 15 => // float
          (buf.getFloat(p).toDouble, p + 4)
        case other =>
          throw new IllegalArgumentException(s"mmdb data type $other")
      }
    }

    // ---- tree walk ----

    /** All IPv4 networks with data, as inclusive [start, end] ranges in
      * trie (= ascending, disjoint) order. For ip_version=6 databases
      * the walk starts below the 96-zero-bit prefix, where IPv4
      * addresses live. */
    def ipv4Ranges(): Vector[Range] = {
      var root = 0
      if (metadata.ipVersion == 6) {
        var d = 0
        while (d < 96) {
          val r = record(root, 0)
          require(r < metadata.nodeCount,
            "IPv4 space is covered by a record above depth 96")
          root = r
          d += 1
        }
      }
      val out = Vector.newBuilder[Range]
      val stack = mutable.Stack[(Int, Long, Int)]((root, 0L, 0))
      while (stack.nonEmpty) {
        val (node, prefix, depth) = stack.pop()
        // a node at depth d describes /d+1 children — beyond /32 the
        // tree is malformed for IPv4 space
        require(depth < 32, "tree deeper than 32 bits in IPv4 space")
        // right pushed first so left (lower range) pops first
        var side = 1
        while (side >= 0) {
          val r = record(node, side)
          val childPrefix = (prefix << 1) | side
          if (r < metadata.nodeCount) {
            stack.push((r, childPrefix, depth + 1))
          } else if (r > metadata.nodeCount) {
            val span = 32 - (depth + 1)
            val start = childPrefix << span
            out += Range(start, start + (1L << span) - 1, dataAt(r))
          } // == nodeCount: no data
          side -= 1
        }
      }
      out.result().sortBy(_.start)
    }
  }

  // ---- field extraction for the Dims.loadGeo schema ----

  private def dig(data: Any, path: String*): Option[Any] =
    path.foldLeft(Option(data)) {
      case (Some(m: Map[String @unchecked, Any @unchecked]), k) => m.get(k)
      case _ => None
    }

  /** (country, city, asn, as_name) from a City or ASN record — the
    * exact fields the reference resolves (App.java:413-419). */
  def geoFields(data: Any): (String, String, String, String) = (
    dig(data, "country", "iso_code").map(_.toString).getOrElse(""),
    dig(data, "city", "names", "en").map(_.toString).getOrElse(""),
    dig(data, "autonomous_system_number").map(_.toString).getOrElse(""),
    dig(data, "autonomous_system_organization").map(_.toString)
      .getOrElse(""))

  /** Export an mmdb to [[Dims.loadGeo]] CSV. Adjacent trie ranges with
    * identical fields merge into one row (a /15 split across two /16
    * nodes comes back as one range), keeping the dim minimal while
    * staying disjoint. */
  def exportCsv(mmdbPath: String, csvPath: String): Int = {
    val db = read(mmdbPath)
    val rows = db.ipv4Ranges().map { r =>
      val (country, city, asn, asName) = geoFields(r.data)
      (r.start, r.end, country, city, asn, asName)
    }
    val merged = rows.foldLeft(Vector.empty[(Long, Long, String, String,
        String, String)]) { (acc, r) =>
      acc.lastOption match {
        case Some(last) if last._2 + 1 == r._1 &&
            (last._3, last._4, last._5, last._6) == (r._3, r._4, r._5, r._6) =>
          acc.init :+ ((last._1, r._2, r._3, r._4, r._5, r._6))
        case _ => acc :+ r
      }
    }
    def esc(s: String): String =
      if (s.exists(c => c == ',' || c == '"' || c == '\n'))
        "\"" + s.replace("\"", "\"\"") + "\""
      else s
    val sb = new StringBuilder("start_ip,end_ip,country,city,asn,as_name\n")
    merged.foreach { case (s, e, country, city, asn, asName) =>
      sb.append(s).append(',').append(e).append(',')
        .append(esc(country)).append(',').append(esc(city)).append(',')
        .append(asn).append(',').append(esc(asName)).append('\n')
    }
    Files.write(Paths.get(csvPath), sb.toString.getBytes("UTF-8"))
    merged.size
  }
}
