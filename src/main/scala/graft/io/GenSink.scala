package graft.io

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{BooleanType, DoubleType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 WRITE connector — the sink half of the engine's
  * custom-connector surface ([[GenSource]] is the read half): a
  * line-delimited-JSON writer implemented directly against the V2
  * write protocol (WriteBuilder → BatchWrite → per-partition
  * DataWriter → driver-side commit), the API shape every external
  * store sink (warehouse, queue, index) plugs in through.
  *
  * `df.write.format("graftsink").option("path", dir).save()`
  *
  * What the protocol buys at scale, demonstrated for real here:
  *  - each input partition streams through its OWN DataWriter (one
  *    task, one file, no driver funnel — 1000 executors write 1000
  *    files concurrently);
  *  - task outputs are provisional until the DRIVER commits: writers
  *    emit their file as a WriterCommitMessage, abort() deletes
  *    partial files, so a failed/speculative task never corrupts the
  *    sink (the unit of atomicity a distributed sink needs);
  *  - overwrite mode arrives as SupportsTruncate on the builder —
  *    the sink clears the target before the new write commits.
  *
  * Types: long/int/double/string/boolean columns (the JSONL training
  * -corpus subset); strings are JSON-escaped. GenSinkSpec pins the
  * round-trip, per-partition file layout, and truncate; qD5 drives
  * write → schema-inferred re-read → aggregate against the
  * parquet-direct oracle (the q57 losslessness contract).
  */
class GenSink extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graftsink"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType() // write-only source: schema comes from the frame

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("graftsink requires option(\"path\")"))
    new GenSinkTable(schema, path)
  }
}

private[io] class GenSinkTable(writeSchema: StructType, path: String)
    extends Table with SupportsWrite {
  override def name(): String = s"graftsink($path)"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.STREAMING_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GenSinkWriteBuilder(info.schema(), path)
}

private[io] class GenSinkWriteBuilder(schema: StructType, path: String)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new GenSinkBatchWrite(schema, path, doTruncate)
    override def toStreaming: StreamingWrite =
      new GenSinkStreamingWrite(schema, path, doTruncate)
  }
}

/** Streaming half of the sink. Each task attempt writes to a UNIQUE
  * temp name (taskId in the name — speculation or a retry racing a
  * zombie attempt can never open the same file) and atomically
  * renames on task commit; epoch commit then RECONCILES the epoch's
  * directory against the committed message set, deleting any file of
  * this epoch not in it (a losing attempt's rename, or a previous
  * replay of the same epoch that planned more partitions). Replayed
  * epochs therefore converge to exactly the committed attempt's rows
  * — idempotent re-execution, which for a file sink IS the
  * exactly-once contract. Epoch commit/abort arrive on the driver
  * per micro-batch, same protocol shape as the batch path. */
private[io] class GenSinkStreamingWrite(schema: StructType, path: String,
                                        truncate: Boolean)
    extends StreamingWrite {
  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    new File(path).mkdirs()
    new GenSinkStreamingWriterFactory(schema, path)
  }

  private def epochFiles(epochId: Long): Array[File] = {
    val fin = s"part-e$epochId-"
    val tmp = s".part-e$epochId-"
    Option(new File(path).listFiles()).getOrElse(Array.empty).filter { f =>
      val n = f.getName
      (n.startsWith(fin) && n.endsWith(".jsonl")) ||
        (n.startsWith(tmp) && n.endsWith(".tmp"))
    }
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val keep = messages.collect { case GenSinkFile(f) => new File(f).getName }.toSet
    // Complete-mode (truncate) epochs re-emit the FULL result: after
    // this epoch commits, every earlier epoch's files must go too, or
    // a re-read of the directory double-counts each group. The
    // builder's truncate flag arrives here via build().toStreaming.
    // Only COMMITTED final files (the sink's own ^part-e<n>- naming)
    // are swept — a bare contains("part-e") also matched same-epoch
    // in-flight ".part-e*.tmp" attempt files (breaking a straggling
    // speculative writer's post-commit rename) and any unrelated
    // file whose name happens to contain the substring; tmp files
    // stay owned by the abort/attempt cleanup path.
    val doomed =
      if (truncate)
        Option(new File(path).listFiles()).getOrElse(Array.empty)
          .filter(f => f.getName.matches("part-e\\d+-.*\\.jsonl"))
      else epochFiles(epochId)
    doomed.filterNot(f => keep(f.getName)).foreach(_.delete())
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    epochFiles(epochId).foreach(_.delete())
}

private[io] class GenSinkStreamingWriterFactory(schema: StructType, path: String)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new GenSinkWriter(schema,
      s"$path/.part-e$epochId-p$partitionId-t$taskId.jsonl.tmp",
      s"$path/part-e$epochId-p$partitionId-t$taskId.jsonl")
}

/** Commit message: the finished file this task produced. */
private[io] case class GenSinkFile(path: String) extends WriterCommitMessage

private[io] class GenSinkBatchWrite(schema: StructType, path: String,
                                    truncate: Boolean) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val dir = new File(path)
    if (truncate && dir.exists())
      dir.listFiles().filter(_.getName.endsWith(".jsonl")).foreach(_.delete())
    dir.mkdirs()
    new GenSinkWriterFactory(schema, path)
  }

  // the driver-side commit point: all task files are already in
  // place (each task's commit() sealed its own file); a production
  // sink would atomically publish the manifest here
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case GenSinkFile(f) => new File(f).delete(); ()
      case _ => ()
    }
}

private[io] class GenSinkWriterFactory(schema: StructType, path: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GenSinkWriter(schema, s"$path/.part-$partitionId-$taskId.jsonl.tmp",
      s"$path/part-$partitionId-$taskId.jsonl")
}

/** Writes to `tmpFile`, atomically renamed to `file` on task commit —
  * a crashed or aborted attempt leaves only a dot-temp no reader
  * globs, never a half-written visible file. */
private[io] class GenSinkWriter(schema: StructType, tmpFile: String, file: String)
    extends DataWriter[InternalRow] {
  // explicit UTF-8: FileWriter's platform-default charset silently
  // mangles non-ASCII text on ASCII-locale hosts
  private val out = Files.newBufferedWriter(Paths.get(tmpFile), StandardCharsets.UTF_8)

  private def jsonEscape(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '"' => sb ++= "\\\""
      case '\\' => sb ++= "\\\\"
      case '\n' => sb ++= "\\n"
      case '\r' => sb ++= "\\r"
      case '\t' => sb ++= "\\t"
      case c if c < ' ' => sb ++= f"\\u${c.toInt}%04x"
      case c => sb += c
    }
    sb.toString
  }

  // per-SCHEMA precompute (this is the per-row hot path): escaped
  // "name": prefixes and an unsupported-type check up front, so
  // write() does no constant-string escaping or array allocation
  private val namePrefixes: Array[String] =
    schema.fields.map(f => "\"" + jsonEscape(f.name) + "\":")
  schema.fields.foreach { f =>
    f.dataType match {
      case LongType | IntegerType | DoubleType | BooleanType | StringType => ()
      case dt => throw new IllegalArgumentException(
        s"graftsink supports long/int/double/string/boolean, got $dt for ${f.name}")
    }
  }

  override def write(row: InternalRow): Unit = {
    val sb = new java.lang.StringBuilder(64)
    sb.append('{')
    var i = 0
    while (i < namePrefixes.length) {
      if (i > 0) sb.append(',')
      sb.append(namePrefixes(i))
      if (row.isNullAt(i)) sb.append("null")
      else schema.fields(i).dataType match {
        case LongType => sb.append(row.getLong(i))
        case IntegerType => sb.append(row.getInt(i))
        case DoubleType =>
          // JSON has no NaN/Infinity literal — emit null rather
          // than a token that corrupts the whole record on re-read
          val d = row.getDouble(i)
          if (java.lang.Double.isFinite(d)) sb.append(d) else sb.append("null")
        case BooleanType => sb.append(row.getBoolean(i))
        case StringType =>
          sb.append('"').append(jsonEscape(row.getUTF8String(i).toString))
            .append('"')
        case _ => () // unreachable: checked at construction
      }
      i += 1
    }
    sb.append('}')
    out.write(sb.toString)
    out.newLine()
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    // POSIX rename: atomic, replaces any same-name leftover
    Files.move(Paths.get(tmpFile), Paths.get(file),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    GenSinkFile(file)
  }
  override def abort(): Unit = { out.close(); new File(tmpFile).delete(); () }
  override def close(): Unit = ()
}
