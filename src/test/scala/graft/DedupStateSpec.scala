package graft

import java.io.File

import scala.concurrent.duration._
import scala.concurrent.{Await, ExecutionContext, Future}

import org.apache.spark.sql.functions._

import graft.ops.Dedup
import graft.sources.Tables

/** Pins the corpus-state commit protocol: build-once/read-after,
  * atomic publish (readers never see half-state), and safe concurrent
  * builders — the properties the streaming ingest loop relies on. */
class DedupStateSpec extends SparkSpec {

  private def corpusDocs =
    Tables.documents(spark, sfDir).filter(col("doc_id") % 10 =!= 0)

  private def freshStateDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-$name").toFile
    d.deleteOnExit()
    new File(d, "state").getPath
  }

  test("state builds once; a second call reads without rewriting") {
    val dir = freshStateDir("state-once")
    val st1 = Dedup.persistedCorpusState(spark, corpusDocs, dir)
    val n = st1.shingles.count()
    assert(n > 0)
    val mtime = new File(dir).lastModified()
    val st2 = Dedup.persistedCorpusState(spark, corpusDocs, dir)
    assert(new File(dir).lastModified() == mtime,
      "second call must be read-only — no rebuild, no republish")
    assert(st2.shingles.count() == n)
  }

  test("the published dir appears atomically: all four parts complete") {
    val dir = freshStateDir("state-atomic")
    Dedup.persistedCorpusState(spark, corpusDocs, dir)
    Seq("shingles", "bands", "counts", "hashes").foreach { p =>
      assert(new File(dir, s"$p/_SUCCESS").exists(),
        s"published state must contain a complete $p")
    }
    // the writer-private tmp dir must not survive the publish
    val root = new File(dir)
    val leftovers = root.getParentFile.listFiles()
      .filter(_.getName.startsWith(root.getName + ".tmp"))
    assert(leftovers.isEmpty, s"tmp dirs must not leak: ${leftovers.mkString(",")}")
  }

  test("concurrent builders race safely: both return usable state, no tmp leaks") {
    val dir = freshStateDir("state-race")
    implicit val ec: ExecutionContext = ExecutionContext.global
    val states = Await.result(
      Future.sequence((1 to 2).map(_ =>
        Future(Dedup.persistedCorpusState(spark, corpusDocs, dir)))),
      5.minutes)
    val counts = states.map(_.hashes.count())
    assert(counts.forall(_ > 0) && counts.distinct.size == 1,
      s"both racers must read the same complete state: $counts")
    val root = new File(dir)
    val leftovers = root.getParentFile.listFiles()
      .filter(_.getName.startsWith(root.getName + ".tmp"))
    assert(leftovers.isEmpty, s"the losing writer must discard its tmp: ${leftovers.mkString(",")}")
  }
}
