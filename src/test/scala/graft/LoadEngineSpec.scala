package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.operators._
import graft.sources.InMemoryTableStore

/** Load-side semantics per the reference LoadOperation/LoadStep
  * (/root/reference/amaxa/amaxa.py:239-535) and the end-to-end round-trip
  * tests (test/test_org/test_end_to_end.py:31-90).
  */
class LoadEngineSpec extends AnyFunSuite {
  import Fixture._
  lazy val spark = SparkTestBase.spark

  def freshTarget(): InMemoryTableStore = store()

  def loadSteps = Seq(
    LoadStepSpec("Account", Seq("Id", "Name", "ParentId")),
    LoadStepSpec("Contact", Seq("Id", "LastName", "IsEmailBounced", "AccountId", "ReportsToId")))

  test("two-stage load remaps FKs consistently (end_to_end.py:31-90)") {
    val target = freshTarget()
    val op = new LoadOperation(target, catalog, loadSteps,
      Map("Account" -> accounts, "Contact" -> contacts))
    assert(op.execute() == 0)
    assert(op.success)

    // Every source row inserted.
    val newAccounts = target.scan("Account")
    val newContacts = target.scan("Contact")
    assert(newAccounts.count() == 5)
    assert(newContacts.count() == 4)

    // New ids differ from originals.
    val newIds = newAccounts.select("Id").collect().map(_.getString(0)).toSet
    assert(newIds.intersect(Set(acct(1), acct(3))).isEmpty)

    // FK consistency: Caprica's contacts point at Caprica's NEW id.
    val idMap = op.idMap.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val capricaNew = idMap(acct(3))
    val adama = newContacts.where(col("LastName") === "Adama").collect().head
    assert(adama.getAs[String]("AccountId") == capricaNew)

    // Self-FK (ParentId) populated in the dependents stage.
    val mid = newAccounts.where(col("Name") === "Mid").collect().head
    assert(mid.getAs[String]("ParentId") == idMap(acct(1)))
    val leaf = newAccounts.where(col("Name") === "Leaf").collect().head
    assert(leaf.getAs[String]("ParentId") == capricaNew)

    // Contact self-FK (ReportsToId) also deferred + remapped.
    val roslin = newContacts.where(col("LastName") === "Roslin").collect().head
    assert(roslin.getAs[String]("ReportsToId") == idMap(cont(1)))

    // Result channel: one success row per input record, no errors.
    assert(op.results("Account").where(col("error").isNotNull).isEmpty)
    assert(op.results("Account").where(col("newId").isNotNull).count() == 5)
  }

  test("bad boolean fails the whole step before insert (amaxa:421-433)") {
    import spark.implicits._
    val badContacts = Seq(
      (cont(1), "Adama", "maybe", null.asInstanceOf[String], null.asInstanceOf[String]))
      .toDF("Id", "LastName", "IsEmailBounced", "AccountId", "ReportsToId")
    val target = freshTarget()
    val op = new LoadOperation(target, catalog,
      Seq(LoadStepSpec("Contact", Seq("Id", "LastName", "IsEmailBounced"))),
      Map("Contact" -> badContacts))
    assert(op.execute() == -1)
    assert(!op.success)
    assert(target.scan("Contact").isEmpty) // nothing inserted
    val err = op.results("Contact").where(col("error").isNotNull).collect().head
    assert(err.getAs[String]("error").contains("Invalid Boolean value maybe"))
  }

  test("duplicate input ids fail the step (deterministic-id contract)") {
    import spark.implicits._
    val dup = Seq(
      (cont(1), "Adama", "true"), (cont(1), "Adama2", "false"), (cont(2), "Roslin", "true"))
      .toDF("Id", "LastName", "IsEmailBounced")
    val target = freshTarget()
    val op = new LoadOperation(target, catalog,
      Seq(LoadStepSpec("Contact", Seq("Id", "LastName", "IsEmailBounced"))),
      Map("Contact" -> dup))
    assert(op.execute() == -1)
    assert(!op.success)
    assert(target.scan("Contact").isEmpty)
    val errs = op.results("Contact").where(col("error").isNotNull).collect()
    assert(errs.length == 2)
    assert(errs.forall(_.getAs[String]("error") == s"Duplicate record id ${cont(1)}"))
  }

  test("dependents stage registers only errors in results (amaxa:505-510)") {
    val target = freshTarget()
    val op = new LoadOperation(target, catalog, loadSteps,
      Map("Account" -> accounts, "Contact" -> contacts))
    assert(op.execute() == 0)
    // One row per input record: success rows come only from the insert
    // stage, so every result row carries a newId (no blank dependent rows).
    assert(op.results("Account").count() == 5)
    assert(op.results("Account").where(col("newId").isNull).isEmpty)
    assert(op.results("Contact").count() == 4)
    assert(op.results("Contact").where(col("newId").isNull).isEmpty)
  }

  test("boolean synonyms normalize on load (amaxa:349-363)") {
    import spark.implicits._
    val c = Seq(
      (cont(1), "A", "YES"), (cont(2), "B", "f"), (cont(3), "C", ""),
      (cont(4), "D", null.asInstanceOf[String]))
      .toDF("Id", "LastName", "IsEmailBounced")
    val target = freshTarget()
    val op = new LoadOperation(target, catalog,
      Seq(LoadStepSpec("Contact", Seq("Id", "LastName", "IsEmailBounced"))),
      Map("Contact" -> c))
    assert(op.execute() == 0)
    val got = target.scan("Contact")
      .select("LastName", "IsEmailBounced").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("A" -> "true", "B" -> "false", "C" -> "false", "D" -> "false"))
  }

  test("resume: already-mapped rows are skipped (amaxa:403-405)") {
    import spark.implicits._
    val target = freshTarget()
    val preMap = Seq((acct(1), "001PRELOADEDIDXXXX")).toDF("originalId", "newId")
    val op = new LoadOperation(target, catalog,
      Seq(LoadStepSpec("Account", Seq("Id", "Name", "ParentId"))),
      Map("Account" -> accounts), initialIdMap = Some(preMap))
    assert(op.execute() == 0)
    // acct1 was already loaded → only 4 inserts.
    assert(target.scan("Account").count() == 4)
    // But Mid's ParentId still resolves through the preloaded mapping.
    val mid = target.scan("Account").where(col("Name") === "Mid").collect().head
    assert(mid.getAs[String]("ParentId") == "001PRELOADEDIDXXXX")
  }

  test("state save/load round-trip (loader/state.py)") {
    val target = freshTarget()
    val op = new LoadOperation(target, catalog, loadSteps,
      Map("Account" -> accounts, "Contact" -> contacts))
    assert(op.execute() == 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_state").toString
    op.saveState(dir)
    val (idMap2, stage2) = LoadOperation.loadState(spark, dir)
    assert(stage2 == LoadStage.Dependents)
    assert(idMap2.count() == op.idMap.count())
  }

  test("mapper renames columns + applies transforms on load (F5/T6)") {
    import spark.implicits._
    val input = Seq((acct(7), "  SHOUTY NAME  ")).toDF("AccountId", "AccountName")
    val target = freshTarget()
    val op = new LoadOperation(target, catalog,
      Seq(LoadStepSpec("Account", Seq("Id", "Name"))),
      Map("Account" -> input),
      mappers = Map("Account" -> DataMapper(
        fieldNameMapping = Map("AccountId" -> "Id", "AccountName" -> "Name"),
        fieldTransforms = Map("AccountName" -> Seq(
          TransformSpec("strip"), TransformSpec("lowercase"))))))
    assert(op.execute() == 0)
    val row = target.scan("Account").collect().head
    assert(row.getAs[String]("Name") == "shouty name")
  }
}
