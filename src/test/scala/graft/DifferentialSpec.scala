package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.operators._
import graft.sources.InMemoryTableStore

import scala.util.Random

/** Differential testing: the engine's traversal semantics vs an
  * independent in-memory reference implementation, over randomized
  * graphs (seeded, deterministic). Catches anything the fixed fixtures
  * and the SQL oracle both miss.
  */
class DifferentialSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  val catalog = new Catalog(Seq(
    TableSchema("Node", Seq(
      FieldMeta("Id", "id", "tns:ID"),
      FieldMeta("ParentId", "reference", "tns:ID", Seq("Node"))),
      keyPrefix = "00x", idField = "Id"),
    TableSchema("Child", Seq(
      FieldMeta("Id", "id", "tns:ID"),
      FieldMeta("NodeId", "reference", "tns:ID", Seq("Node"))),
      keyPrefix = "00c", idField = "Id")))

  /** Undirected reachability over parent edges from seeds (what trace-all
    * self-lookup closure must compute) — plain BFS, no Spark.
    */
  def bfsClosure(parents: Map[Long, Long], seeds: Set[Long]): Set[Long] = {
    val children = parents.toSeq.groupMap(_._2)(_._1)
    val visited = scala.collection.mutable.Set.empty[Long]
    val queue = scala.collection.mutable.Queue(seeds.toSeq: _*)
    while (queue.nonEmpty) {
      val n = queue.dequeue()
      if (visited.add(n)) {
        parents.get(n).foreach(queue.enqueue(_))
        children.getOrElse(n, Nil).foreach(queue.enqueue(_))
      }
    }
    visited.toSet
  }

  (0 until 5).foreach { trial =>
    test(s"random forest closure matches BFS reference (trial $trial)") {
      import spark.implicits._
      val rnd = new Random(42 + trial)
      val n = 200 + rnd.nextInt(300)
      // Random forest: each node may point at a lower-numbered parent.
      val parents: Map[Long, Long] = (1L until n).flatMap { i =>
        if (rnd.nextDouble() < 0.7) Some(i -> rnd.nextLong(i)) else None
      }.toMap
      val seeds = (0 until 5).map(_ => rnd.nextLong(n)).toSet
      val expected = bfsClosure(parents, seeds)

      val nodes = (0L until n).map(i =>
        (i.toString, parents.get(i).map(_.toString).orNull)).toDF("Id", "ParentId")
      val st = new InMemoryTableStore(spark, catalog.byName)
      st.register("Node", nodes)
      val op = new ExtractOperation(st, catalog, Seq(
        ExtractStep("Node",
          ExtractionScope.SelectedRecords(seeds.map(_.toString).toSeq),
          Seq("Id", "ParentId"))))
      assert(op.execute() == 0, op.errors)
      val got = op.result("Node").select("Id").collect().map(_.getString(0).toLong).toSet
      assert(got == expected,
        s"missing=${expected -- got} extra=${got -- expected}")
    }
  }

  test("post-load referential integrity: every remapped FK resolves (J3 totality)") {
    import spark.implicits._
    val rnd = new Random(7)
    val nNodes = 100
    val nodes = (0 until nNodes).map(i => (s"n$i", s"Node $i")).toDF("Id", "Name")
      .withColumnRenamed("Name", "NameX").withColumnRenamed("NameX", "Name")
    val childs = (0 until 400).map(i =>
      (s"c$i", s"n${rnd.nextInt(nNodes)}")).toDF("Id", "NodeId")

    val cat2 = new Catalog(Seq(
      TableSchema("Node", Seq(
        FieldMeta("Id", "id", "tns:ID"),
        FieldMeta("Name", "string", "xsd:string")),
        keyPrefix = "00x", idField = "Id"),
      catalog("Child")))
    val target = new InMemoryTableStore(spark, cat2.byName)
    val op = new LoadOperation(target, cat2, Seq(
      LoadStepSpec("Node", Seq("Id", "Name")),
      LoadStepSpec("Child", Seq("Id", "NodeId"))),
      Map("Node" -> nodes, "Child" -> childs))
    assert(op.execute() == 0)
    // Totality: every Child.NodeId in the target is a real target Node id.
    val dangling = target.scan("Child")
      .join(target.scan("Node").select(col("Id").as("NodeId")), Seq("NodeId"), "left_anti")
    assert(dangling.isEmpty, dangling.collect().mkString(","))
    // And none of the original FK values survived unremapped.
    val unremapped = target.scan("Child").where(col("NodeId").startsWith("n"))
    assert(unremapped.isEmpty)
  }
}
