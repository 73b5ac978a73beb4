package graft

import java.nio.file.Files
import java.time.Instant

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.SnapshotCatalog

/** Automatic MV query rewrite (aggregate navigation): user aggregates
  * over a base table are served from a FRESH materialized view's backing
  * without the query referencing the view — exact group matches per-row,
  * group subsets by rolling up the stored partials, residual filters on
  * group keys re-applied on the backing. Staleness, non-subsumed filters,
  * non-key residuals, distinct-rollups, and the kill switch all fall back
  * to the base scan. Results must be IDENTICAL either way. */
class MvRewriteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshCat(name: String): SnapshotCatalog = {
    val wh = Files.createTempDirectory("graft_mvr_").toString
    spark.conf.set(s"spark.sql.catalog.$name", "graft.catalog.spark.SnapCatalogPlugin")
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    var tick = 0L
    new SnapshotCatalog(spark, wh, clock = () =>
      { tick += 1; Instant.parse("2026-07-02T00:00:00Z").plusSeconds(tick * 60) })
  }

  /** Runs `q` with the rewrite off (ground truth) and on; returns
    * (truth == rewritten-result, did-the-plan-read-a-backing-table). */
  private def check(q: String): (Boolean, Boolean) = {
    spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
    val truth = spark.sql(q).collect().toSeq
    spark.conf.set("spark.graft.mv.rewrite.enabled", "true")
    val df = spark.sql(q)
    val viaMv = df.queryExecution.optimizedPlan.toString.contains("__mv_")
    val got = df.collect().toSeq
    (truth.map(_.toString).sorted == got.map(_.toString).sorted, viaMv)
  }
  private def assertRewritten(q: String): Unit = {
    val (same, via) = check(q)
    assert(via, s"expected MV rewrite for: $q")
    assert(same, s"rewritten result differs for: $q")
  }
  private def assertNotRewritten(q: String): Unit = {
    val (same, via) = check(q)
    assert(!via, s"expected NO rewrite for: $q")
    assert(same)
  }

  test("exact, rollup, residual-filter, staleness, kill-switch") {
    val cat = freshCat("mvr")
    val rows = (1 to 400).map { i =>
      (s"k${i % 4}", s"g${i % 3}",
        if (i % 17 == 0) None else Some(i.toLong),
        if (i % 23 == 0) None else Some((i % 7) * 0.5))
    }
    val df = rows.toDF("k1", "k2", "v", "w")
    cat.createTable("db", "fact", df.schema)
    cat.append("db", "fact", df)
    cat.createMaterializedView("db", "rollup_mv",
      "SELECT k1, k2, sum(v) AS sv, count(*) AS n, avg(w) AS aw, " +
        "min(v) AS mn, max(v) AS mx FROM mvr.db.fact GROUP BY k1, k2")

    // exact group match: served per-row from the backing
    assertRewritten("SELECT k1, k2, sum(v) AS s, count(*) AS c, avg(w) AS a, " +
      "min(v) AS lo, max(v) AS hi FROM mvr.db.fact GROUP BY k1, k2 ORDER BY k1, k2")
    // rollup to a key subset: counts sum, sums sum, extrema fold, avg
    // re-derives from the stored sum/count partials
    assertRewritten("SELECT k1, sum(v) AS s, count(*) AS c, avg(w) AS a, " +
      "min(v) AS lo, max(v) AS hi FROM mvr.db.fact GROUP BY k1 ORDER BY k1")
    // global rollup (no GROUP BY; mixed aggregates dodge the
    // metadata-count carve-out)
    assertRewritten("SELECT sum(v) AS s, count(*) AS c, avg(w) AS a FROM mvr.db.fact")
    // count(v) (non-null count) derives from sum(v)'s count partial;
    // arithmetic AROUND aggregates carries over
    assertRewritten("SELECT k2, count(v) AS cv, sum(v) / count(*) AS r " +
      "FROM mvr.db.fact GROUP BY k2")
    // residual filter on a group-key column re-applies on the backing
    assertRewritten("SELECT k1, sum(v) AS s FROM mvr.db.fact " +
      "WHERE k2 = 'g1' GROUP BY k1 ORDER BY k1")
    // HAVING / ORDER BY parents resolve over the rewritten aggregate
    assertRewritten("SELECT k1, count(*) AS c FROM mvr.db.fact GROUP BY k1 " +
      "HAVING count(*) > 10 ORDER BY c DESC")

    // unfiltered bare count(*) stays with the O(1) metadata-count path
    assertNotRewritten("SELECT count(*) AS c FROM mvr.db.fact")
    // a filter on a NON-key column cannot re-apply on the backing
    assertNotRewritten("SELECT k1, count(*) AS c FROM mvr.db.fact " +
      "WHERE v > 100 GROUP BY k1")
    // grouping by a non-key column is not covered
    assertNotRewritten("SELECT k1, v % 2 AS p, count(*) AS c FROM mvr.db.fact " +
      "GROUP BY k1, v % 2")

    // STALENESS: any base commit disables the rewrite until refresh
    cat.append("db", "fact", Seq(("k9", "g9", Some(5L), Some(1.0)))
      .toDF("k1", "k2", "v", "w"))
    assertNotRewritten("SELECT k1, sum(v) AS s FROM mvr.db.fact GROUP BY k1")
    // …unless the session OPTS INTO bounded staleness: the stale MV
    // answers, with its last-refreshed state (k9 not yet visible)
    spark.conf.set("spark.graft.mv.rewrite.allow-stale", "true")
    val staleDf = spark.sql("SELECT k1, sum(v) AS s FROM mvr.db.fact GROUP BY k1")
    assert(staleDf.queryExecution.optimizedPlan.toString.contains("__mv_"))
    assert(!staleDf.collect().exists(_.getString(0) == "k9"),
      "stale rewrite must serve the LAST REFRESHED state")
    spark.conf.set("spark.graft.mv.rewrite.allow-stale", "false")
    assert(cat.refreshMaterializedView("db", "rollup_mv")._1 == "incremental_agg")
    assertRewritten("SELECT k1, sum(v) AS s FROM mvr.db.fact GROUP BY k1")

    // MoR delete churn: refresh restores rewritability and exactness
    cat.deleteMoR("db", "fact", col("v") % 5 === 0)
    assertNotRewritten("SELECT k1, sum(v) AS s FROM mvr.db.fact GROUP BY k1")
    cat.refreshMaterializedView("db", "rollup_mv")
    assertRewritten("SELECT k1, sum(v) AS s, count(*) AS c, avg(w) AS a " +
      "FROM mvr.db.fact GROUP BY k1 ORDER BY k1")

    // kill switch
    spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
    val plan = spark.sql("SELECT k1, sum(v) AS s FROM mvr.db.fact GROUP BY k1")
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("__mv_"))
    spark.conf.set("spark.graft.mv.rewrite.enabled", "true")
  }

  test("grouping-sets navigation: ROLLUP/CUBE/GROUPING SETS served from the backing") {
    val cat = freshCat("mvrgs")
    val rows = (1 to 300).map { i =>
      (s"k${i % 4}", if (i % 11 == 0) None else Some(s"g${i % 3}"),
        if (i % 17 == 0) None else Some(i.toLong),
        (i % 7) * 0.5)
    }
    val df = rows.toDF("k1", "k2", "v", "w")
    cat.createTable("db", "fact", df.schema)
    cat.append("db", "fact", df)
    cat.createMaterializedView("db", "gs_mv",
      "SELECT k1, k2, sum(v) AS sv, count(*) AS n, avg(w) AS aw, " +
        "min(v) AS mn FROM mvrgs.db.fact GROUP BY k1, k2")

    // ROLLUP: every grouping level re-aggregates the stored partials,
    // grouping()/grouping_id() arithmetic carries over (same key order =
    // same bit layout); k2 carries DATA nulls, which gid must keep
    // distinct from mask nulls
    assertRewritten("SELECT k1, k2, count(*) AS c, sum(v) AS s, avg(w) AS a, " +
      "min(v) AS lo, grouping(k1) AS g1, grouping_id() AS gid " +
      "FROM mvrgs.db.fact GROUP BY ROLLUP(k1, k2) ORDER BY gid, k1, k2")
    // CUBE and explicit GROUPING SETS (with the empty set)
    assertRewritten("SELECT k1, k2, count(*) AS c, min(v) AS lo " +
      "FROM mvrgs.db.fact GROUP BY CUBE(k1, k2)")
    assertRewritten("SELECT k1, k2, sum(v) AS s " +
      "FROM mvrgs.db.fact GROUP BY GROUPING SETS ((k1), (k2), ())")
    // count(v) from the sum partial's count lane; residual key filter;
    // HAVING parent over the rewritten analytic
    assertRewritten("SELECT k1, k2, count(v) AS cv FROM mvrgs.db.fact " +
      "WHERE k1 <> 'k3' GROUP BY ROLLUP(k1, k2) HAVING count(v) > 5")

    // refusals: an aggregate the backing cannot derive (max has no
    // stored extremum), a DISTINCT aggregate with NO sidecar (gs_mv's
    // body has no distinct, so no per-value state exists — honest
    // refusal; the sidecar-served path is its own test), a non-key
    // grouping column
    assertNotRewritten("SELECT k1, max(v) AS hi FROM mvrgs.db.fact " +
      "GROUP BY ROLLUP(k1)")
    assertNotRewritten("SELECT k1, count(DISTINCT v) AS dv FROM mvrgs.db.fact " +
      "GROUP BY ROLLUP(k1)")
    assertNotRewritten("SELECT w, count(*) AS c FROM mvrgs.db.fact " +
      "GROUP BY ROLLUP(w)")

    // staleness gates the analytic exactly like the plain paths
    cat.append("db", "fact", Seq(("k9", Some("g9"), Some(5L), 1.0))
      .toDF("k1", "k2", "v", "w"))
    assertNotRewritten("SELECT k1, count(*) AS c FROM mvrgs.db.fact " +
      "GROUP BY ROLLUP(k1)")
    assert(cat.refreshMaterializedView("db", "gs_mv")._1 == "incremental_agg")
    assertRewritten("SELECT k1, count(*) AS c FROM mvrgs.db.fact " +
      "GROUP BY ROLLUP(k1)")
  }

  test("grouping-sets DISTINCT aggregates served from the copy-count sidecar (r13)") {
    val cat = freshCat("mvrgd")
    val df = (1 to 240).map { i =>
      (s"k${i % 4}", if (i % 11 == 0) None else Some(s"g${i % 3}"),
        if (i % 13 == 0) None else Some((i % 9).toLong))
    }.toDF("k1", "k2", "v")
    cat.createTable("db", "fact", df.schema)
    cat.append("db", "fact", df)
    cat.createMaterializedView("db", "gsd_mv",
      "SELECT k1, k2, count(DISTINCT v) AS cd, count(*) AS n " +
        "FROM mvrgd.db.fact GROUP BY k1, k2")

    // ROLLUP mixing sidecar-served distinct aggregates (count/sum
    // DISTINCT — values shared across collapsed subgroups dedupe) with
    // main-lane merged ones (count(*)) and gid arithmetic; k2 carries
    // DATA nulls the null-safe (keys, gid) join must keep distinct from
    // mask nulls, and v carries nulls (all-NULL groups exist with c=0)
    assertRewritten("SELECT k1, k2, count(DISTINCT v) AS c, " +
      "sum(DISTINCT v) AS sd, count(*) AS n, grouping_id() AS gid " +
      "FROM mvrgd.db.fact GROUP BY ROLLUP(k1, k2) ORDER BY gid, k1, k2")
    // CUBE (the empty set included) + residual filter on a view key
    assertRewritten("SELECT k1, k2, count(DISTINCT v) AS c FROM mvrgd.db.fact " +
      "WHERE k1 <> 'k3' GROUP BY CUBE(k1, k2)")
    // a distinct over a KEY column rides the main lane (the backing
    // holds every surviving key combination)
    assertRewritten("SELECT k1, count(DISTINCT k2) AS dk, count(*) AS n " +
      "FROM mvrgd.db.fact GROUP BY ROLLUP(k1)")
    // a distinct over a column with NO sidecar still refuses
    assertNotRewritten("SELECT k1, count(DISTINCT k2) || '' AS x, " +
      "count(DISTINCT v + 1) AS dv FROM mvrgd.db.fact GROUP BY ROLLUP(k1)")

    // delete churn + incremental refresh: the sidecar retracts dead
    // values and the analytic stays exact against the refreshed state —
    // including the NULL-k2 groups the churn touches (null group keys
    // merge incrementally since r13)
    cat.deleteMoR("db", "fact", col("v") === 4)
    assertNotRewritten("SELECT k1, count(DISTINCT v) AS c FROM mvrgd.db.fact " +
      "GROUP BY ROLLUP(k1)")
    assert(cat.refreshMaterializedView("db", "gsd_mv")._1 == "incremental_agg")
    assertRewritten("SELECT k1, k2, count(DISTINCT v) AS c, count(*) AS n, " +
      "grouping_id() AS gid FROM mvrgd.db.fact " +
      "GROUP BY GROUPING SETS ((k1, k2), (k2), ()) ORDER BY gid, k1, k2")
  }

  test("filtered-body subsumption picks the tighter MV; distinct is exact-only") {
    val cat = freshCat("mvr2")
    val df = (1 to 300).map(i =>
      (s"k${i % 5}", s"g${i % 2}", (i % 11).toLong)).toDF("k1", "k2", "v")
    cat.createTable("db2", "fact", df.schema)
    cat.append("db2", "fact", df)
    cat.createMaterializedView("db2", "wide",
      "SELECT k1, k2, sum(v) AS sv, count(*) AS n FROM mvr2.db2.fact GROUP BY k1, k2")
    cat.createMaterializedView("db2", "narrow",
      "SELECT k1, sum(v) AS sv FROM mvr2.db2.fact WHERE k2 = 'g1' GROUP BY k1")
    cat.createMaterializedView("db2", "dv",
      "SELECT k1, count(DISTINCT v) AS cd FROM mvr2.db2.fact GROUP BY k1")

    // both MVs cover this; the 1-key filtered one is the smaller backing
    spark.conf.set("spark.graft.mv.rewrite.enabled", "true")
    val q = "SELECT k1, sum(v) AS s FROM mvr2.db2.fact WHERE k2 = 'g1' GROUP BY k1"
    val plan = spark.sql(q).queryExecution.optimizedPlan.toString
    assert(plan.contains("__mv_narrow"), plan)
    assertRewritten(q)
    // the wide MV still serves the unfiltered rollup
    assertRewritten("SELECT k2, sum(v) AS s FROM mvr2.db2.fact GROUP BY k2")

    // DISTINCT: exact group match serves from the stored output…
    assertRewritten("SELECT k1, count(DISTINCT v) AS c FROM mvr2.db2.fact GROUP BY k1")
    // …and a COARSER grouping re-aggregates the copy-count SIDECAR
    // (values shared across collapsed subgroups dedupe via the DISTINCT
    // over the value column) — including aggregates the view itself
    // never output (sum/avg DISTINCT from a count-DISTINCT view)
    assertRewritten("SELECT count(DISTINCT v) AS c FROM mvr2.db2.fact")
    assertRewritten("SELECT k1, sum(DISTINCT v) AS s, avg(DISTINCT v) AS a, " +
      "count(DISTINCT v) AS c FROM mvr2.db2.fact GROUP BY k1")
    // mixing a distinct agg with a non-distinct one the sidecar cannot
    // serve → no rewrite, correct from base
    assertNotRewritten("SELECT count(DISTINCT v) AS c, sum(v) AS s " +
      "FROM mvr2.db2.fact")

    // commutes/reorders still match semantically (filter written backwards)
    assertRewritten("SELECT k1, sum(v) AS s FROM mvr2.db2.fact " +
      "WHERE 'g1' = k2 GROUP BY k1")

    // aggregates over a GROUP-KEY column serve off the backing with no
    // partials: every surviving key combo appears there, so distinct
    // counts dedupe over the key column and extrema fold over it
    assertRewritten("SELECT k1, count(DISTINCT k2) AS dk, min(k2) AS lo, " +
      "max(k2) AS hi FROM mvr2.db2.fact GROUP BY k1 ORDER BY k1")
    assertRewritten("SELECT count(DISTINCT k1) AS d FROM mvr2.db2.fact")
    // exact group match: the distinct set of a grouped key is {k} per row
    assertRewritten("SELECT k1, k2, count(DISTINCT k2) AS one, count(*) AS c " +
      "FROM mvr2.db2.fact GROUP BY k1, k2")
  }

  test("join-MV navigation: fact-dim aggregates served from the rollup backing") {
    val cat = freshCat("mvrj")
    val fact = (1 to 500).map(i =>
      (i.toLong, (i % 20).toLong, s"s${i % 3}", (i % 13).toLong))
      .toDF("id", "ck", "status", "v")
    val dim = (0 until 20).map(k => (k.toLong, s"seg${k % 4}")).toDF("ck", "seg")
    cat.createTable("dbj", "fact", fact.schema)
    cat.append("dbj", "fact", fact)
    cat.createTable("dbj", "dim", dim.schema)
    cat.append("dbj", "dim", dim)
    cat.createMaterializedView("dbj", "facts_by_seg",
      "SELECT d.seg, f.status, sum(f.v) AS sv, count(*) AS n " +
        "FROM mvrj.dbj.fact f JOIN mvrj.dbj.dim d ON f.ck = d.ck " +
        "GROUP BY d.seg, f.status")

    // exact join + groups, ON-clause form
    assertRewritten("SELECT d.seg, f.status, sum(f.v) AS s, count(*) AS c " +
      "FROM mvrj.dbj.fact f JOIN mvrj.dbj.dim d ON f.ck = d.ck " +
      "GROUP BY d.seg, f.status ORDER BY 1, 2")
    // rollup to one side's key; join condition in WHERE form (comma join
    // = σ(cond)(A × B) — placement normalizes away); swapped table order
    assertRewritten("SELECT seg, sum(v) AS s, count(*) AS c " +
      "FROM mvrj.dbj.dim d, mvrj.dbj.fact f WHERE d.ck = f.ck " +
      "GROUP BY seg ORDER BY seg")
    // residual filter on a group-key column of the view
    assertRewritten("SELECT seg, count(*) AS c FROM mvrj.dbj.fact f " +
      "JOIN mvrj.dbj.dim d ON f.ck = d.ck WHERE f.status = 's1' GROUP BY seg")
    // a filter on a non-key column cannot re-apply on the backing
    assertNotRewritten("SELECT seg, count(*) AS c FROM mvrj.dbj.fact f " +
      "JOIN mvrj.dbj.dim d ON f.ck = d.ck WHERE f.v > 5 GROUP BY seg")
    // a DIFFERENT join condition is not subsumed
    assertNotRewritten("SELECT seg, count(*) AS c FROM mvrj.dbj.fact f " +
      "JOIN mvrj.dbj.dim d ON f.ck = d.ck AND f.v = d.ck GROUP BY seg")

    // staleness on EITHER side disables until refresh
    cat.append("dbj", "dim", Seq((99L, "seg9")).toDF("ck", "seg"))
    assertNotRewritten("SELECT seg, sum(v) AS s FROM mvrj.dbj.fact f " +
      "JOIN mvrj.dbj.dim d ON f.ck = d.ck GROUP BY seg")
    assert(cat.refreshMaterializedView("dbj", "facts_by_seg")._1
      == "incremental_join_agg")
    assertRewritten("SELECT seg, sum(v) AS s FROM mvrj.dbj.fact f " +
      "JOIN mvrj.dbj.dim d ON f.ck = d.ck GROUP BY seg")
  }

  test("outer-join MV navigation: identical LEFT JOIN trees serve from the backing (r13)") {
    val cat = freshCat("mvro")
    // ck 100-102 have no dim row, so the LEFT JOIN null-extends a seg=NULL
    // group — the class of rows an inner-join MV could never answer
    val fact = (1 to 400).map(i => (i.toLong,
      if (i % 5 == 0) 100L + (i % 3) else (i % 10).toLong, (i % 7).toLong))
      .toDF("id", "ck", "v")
    val dim = (0 until 10).map(k => (k.toLong, s"seg${k % 4}")).toDF("ck", "seg")
    cat.createTable("dbo", "fact", fact.schema)
    cat.append("dbo", "fact", fact)
    cat.createTable("dbo", "dim", dim.schema)
    cat.append("dbo", "dim", dim)
    cat.createMaterializedView("dbo", "lo_mv",
      "SELECT d.seg, count(*) AS n, sum(f.v) AS sv " +
        "FROM mvro.dbo.fact f LEFT JOIN mvro.dbo.dim d ON f.ck = d.ck " +
        "GROUP BY d.seg")

    val exactQ = "SELECT d.seg, count(*) AS c, sum(f.v) AS s " +
      "FROM mvro.dbo.fact f LEFT JOIN mvro.dbo.dim d ON f.ck = d.ck " +
      "GROUP BY d.seg ORDER BY d.seg"
    // exact shape (null-extended group included) serves per-row
    assertRewritten(exactQ)
    // global rollup folds the stored partials
    assertRewritten("SELECT count(*) AS c, sum(f.v) AS s " +
      "FROM mvro.dbo.fact f LEFT JOIN mvro.dbo.dim d ON f.ck = d.ck")
    // a residual filter ABOVE the join on a group key re-applies
    assertRewritten("SELECT d.seg, count(*) AS c " +
      "FROM mvro.dbo.fact f LEFT JOIN mvro.dbo.dim d ON f.ck = d.ck " +
      "WHERE d.seg = 'seg1' GROUP BY d.seg")
    // an INNER join over the same tables is a DIFFERENT tree (it drops
    // the null-extended group) — must not serve from the outer backing
    assertNotRewritten("SELECT d.seg, count(*) AS c " +
      "FROM mvro.dbo.fact f JOIN mvro.dbo.dim d ON f.ck = d.ck " +
      "GROUP BY d.seg")
    // extra ON conjunct: not the same join
    assertNotRewritten("SELECT d.seg, count(*) AS c " +
      "FROM mvro.dbo.fact f LEFT JOIN mvro.dbo.dim d " +
      "ON f.ck = d.ck AND f.v = 1 GROUP BY d.seg")
    // a filter INSIDE the tree (below the join) is not the same tree —
    // it does not commute with the outer join
    assertNotRewritten("SELECT d.seg, count(*) AS c FROM mvro.dbo.fact f " +
      "LEFT JOIN (SELECT * FROM mvro.dbo.dim WHERE ck < 5) d " +
      "ON f.ck = d.ck GROUP BY d.seg")
    // RIGHT JOIN with swapped sides is the SAME relational expression —
    // buildTree normalizes it to LEFT with swapped children, so it
    // navigates to the LEFT-JOIN view body
    assertRewritten("SELECT d.seg, count(*) AS c " +
      "FROM mvro.dbo.dim d RIGHT JOIN mvro.dbo.fact f ON f.ck = d.ck " +
      "GROUP BY d.seg")

    // grouping-sets navigation rides the same strict lane: a ROLLUP over
    // the identical LEFT JOIN re-issues over the backing (merged form)
    assertRewritten("SELECT d.seg, count(*) AS c, sum(f.v) AS s " +
      "FROM mvro.dbo.fact f LEFT JOIN mvro.dbo.dim d ON f.ck = d.ck " +
      "GROUP BY ROLLUP(d.seg) ORDER BY d.seg")

    // churn on the FACT side disables until refresh re-pins
    cat.append("dbo", "fact", Seq((401L, 3L, 5L)).toDF("id", "ck", "v"))
    assertNotRewritten(exactQ)
    cat.refreshMaterializedView("dbo", "lo_mv")
    assertRewritten(exactQ)
  }

  test("N-way star navigation: 3-table join rollups served from the backing (r13)") {
    val cat = freshCat("mvrs")
    val fact = (1 to 600).map(i =>
      (i.toLong, (i % 12).toLong, (i % 8).toLong, (i % 9).toLong))
      .toDF("id", "ck", "pk", "v")
    val cust = (0 until 12).map(k => (k.toLong, s"seg${k % 4}")).toDF("ck", "seg")
    val prod = (0 until 8).map(k => (k.toLong, s"cat${k % 3}")).toDF("pk", "cat")
    cat.createTable("dbs", "fact", fact.schema)
    cat.append("dbs", "fact", fact)
    cat.createTable("dbs", "cust", cust.schema)
    cat.append("dbs", "cust", cust)
    cat.createTable("dbs", "prod", prod.schema)
    cat.append("dbs", "prod", prod)
    cat.createMaterializedView("dbs", "star_mv",
      "SELECT c.seg, p.cat, sum(f.v) AS sv, count(*) AS n " +
        "FROM mvrs.dbs.fact f JOIN mvrs.dbs.cust c ON f.ck = c.ck " +
        "JOIN mvrs.dbs.prod p ON f.pk = p.pk GROUP BY c.seg, p.cat")

    // exact 3-way match, ON-clause form
    assertRewritten("SELECT c.seg, p.cat, sum(f.v) AS s, count(*) AS n " +
      "FROM mvrs.dbs.fact f JOIN mvrs.dbs.cust c ON f.ck = c.ck " +
      "JOIN mvrs.dbs.prod p ON f.pk = p.pk GROUP BY c.seg, p.cat ORDER BY 1, 2")
    // rollup to ONE dimension; all join conjuncts in WHERE form, shuffled
    // table order — σ(cond)(A × B × C) normalization is order-free
    assertRewritten("SELECT seg, sum(v) AS s, count(*) AS n " +
      "FROM mvrs.dbs.prod p, mvrs.dbs.fact f, mvrs.dbs.cust c " +
      "WHERE f.pk = p.pk AND c.ck = f.ck GROUP BY seg ORDER BY seg")
    // global rollup + residual filter on a view key
    assertRewritten("SELECT sum(v) AS s FROM mvrs.dbs.fact f " +
      "JOIN mvrs.dbs.cust c ON f.ck = c.ck JOIN mvrs.dbs.prod p ON f.pk = p.pk " +
      "WHERE p.cat = 'cat1'")

    // negatives: a MISSING dimension (leaf sets differ — the 2-way query
    // is NOT the 3-way body), an EXTRA join conjunct (not subsumed), an
    // OUTER join (not an inner forest)
    assertNotRewritten("SELECT seg, count(*) AS n FROM mvrs.dbs.fact f " +
      "JOIN mvrs.dbs.cust c ON f.ck = c.ck GROUP BY seg")
    assertNotRewritten("SELECT seg, count(*) AS n FROM mvrs.dbs.fact f " +
      "JOIN mvrs.dbs.cust c ON f.ck = c.ck " +
      "JOIN mvrs.dbs.prod p ON f.pk = p.pk AND f.v = p.pk GROUP BY seg")
    assertNotRewritten("SELECT seg, count(*) AS n FROM mvrs.dbs.fact f " +
      "LEFT JOIN mvrs.dbs.cust c ON f.ck = c.ck " +
      "JOIN mvrs.dbs.prod p ON f.pk = p.pk GROUP BY seg")

    // grouping-sets navigation composes with the N-way matcher: a ROLLUP
    // over the 3-way star re-issues over the join-MV backing
    assertRewritten("SELECT seg, cat, sum(v) AS s, count(*) AS n, " +
      "grouping_id() AS gid FROM mvrs.dbs.fact f " +
      "JOIN mvrs.dbs.cust c ON f.ck = c.ck JOIN mvrs.dbs.prod p ON f.pk = p.pk " +
      "GROUP BY ROLLUP(seg, cat) ORDER BY gid, seg, cat")

    // MoR churn on the fact: stale until refresh, rewritten after
    cat.deleteMoR("dbs", "fact", col("v") === 3)
    assertNotRewritten("SELECT seg, sum(v) AS s FROM mvrs.dbs.fact f " +
      "JOIN mvrs.dbs.cust c ON f.ck = c.ck JOIN mvrs.dbs.prod p ON f.pk = p.pk " +
      "GROUP BY seg")
    cat.refreshMaterializedView("dbs", "star_mv")
    assertRewritten("SELECT seg, sum(v) AS s, count(*) AS n " +
      "FROM mvrs.dbs.fact f JOIN mvrs.dbs.cust c ON f.ck = c.ck " +
      "JOIN mvrs.dbs.prod p ON f.pk = p.pk GROUP BY seg ORDER BY seg")
  }

  test("LEFT-JOIN CHAIN navigation: N-ary outer trees serve from the backing (r13)") {
    val cat = freshCat("mvrc")
    val fact = (1 to 300).map(i => (i.toLong, (i % 12).toLong,
      (i % 9).toLong, (i % 5).toLong)).toDF("id", "ck", "pk", "v")
    val cust = (0 until 8).map(k => (k.toLong, s"seg${k % 3}")).toDF("ck", "seg")
    val prod = (0 until 6).map(k => (k.toLong, s"cat${k % 2}")).toDF("pk", "cat")
    cat.createTable("dbc", "fact", fact.schema)
    cat.append("dbc", "fact", fact)
    cat.createTable("dbc", "cust", cust.schema)
    cat.append("dbc", "cust", cust)
    cat.createTable("dbc", "prod", prod.schema)
    cat.append("dbc", "prod", prod)
    cat.createMaterializedView("dbc", "ch_mv",
      "SELECT c.seg, p.cat, count(*) AS n, sum(f.v) AS sv " +
        "FROM mvrc.dbc.fact f LEFT JOIN mvrc.dbc.cust c ON f.ck = c.ck " +
        "LEFT JOIN mvrc.dbc.prod p ON f.pk = p.pk GROUP BY c.seg, p.cat")
    // the identical chain serves exactly (null-extended groups included)
    assertRewritten("SELECT c.seg, p.cat, count(*) AS n, sum(f.v) AS sv " +
      "FROM mvrc.dbc.fact f LEFT JOIN mvrc.dbc.cust c ON f.ck = c.ck " +
      "LEFT JOIN mvrc.dbc.prod p ON f.pk = p.pk GROUP BY c.seg, p.cat " +
      "ORDER BY c.seg, p.cat")
    // a group-subset rollup folds the stored partials
    assertRewritten("SELECT c.seg, count(*) AS n " +
      "FROM mvrc.dbc.fact f LEFT JOIN mvrc.dbc.cust c ON f.ck = c.ck " +
      "LEFT JOIN mvrc.dbc.prod p ON f.pk = p.pk GROUP BY c.seg")
    // an inner chain is a different tree — never served from the outer
    assertNotRewritten("SELECT c.seg, p.cat, count(*) AS n " +
      "FROM mvrc.dbc.fact f JOIN mvrc.dbc.cust c ON f.ck = c.ck " +
      "LEFT JOIN mvrc.dbc.prod p ON f.pk = p.pk GROUP BY c.seg, p.cat")
    // a swapped dim order associates differently — not the same tree
    assertNotRewritten("SELECT c.seg, p.cat, count(*) AS n " +
      "FROM mvrc.dbc.fact f LEFT JOIN mvrc.dbc.prod p ON f.pk = p.pk " +
      "LEFT JOIN mvrc.dbc.cust c ON f.ck = c.ck GROUP BY c.seg, p.cat")
  }

  test("TOP-K navigation: rank-filtered windows serve from the ranked backing (r13)") {
    val cat = freshCat("mvtk")
    val t = (1 to 500).map(i => ((i % 7).toString, i.toLong, (i * 37 % 101).toLong))
      .toDF("g", "id", "v")
    cat.createTable("dbt", "t", t.schema)
    cat.append("dbt", "t", t)
    cat.createMaterializedView("dbt", "top5",
      "SELECT g, id, v, rn FROM (SELECT g, id, v, row_number() OVER " +
        "(PARTITION BY g ORDER BY v DESC, id) AS rn FROM mvtk.dbt.t) s " +
        "WHERE rn <= 5")
    // the exact window serves; so does a TIGHTER bound (top-3 is the
    // stored top-5's rank-filtered prefix)
    assertRewritten("SELECT g, id, v, rn FROM (SELECT g, id, v, " +
      "row_number() OVER (PARTITION BY g ORDER BY v DESC, id) AS rn " +
      "FROM mvtk.dbt.t) s WHERE rn <= 5 ORDER BY g, rn")
    assertRewritten("SELECT g, id FROM (SELECT g, id, v, " +
      "row_number() OVER (PARTITION BY g ORDER BY v DESC, id) AS rn " +
      "FROM mvtk.dbt.t) s WHERE rn <= 3 ORDER BY g, id")
    // a LOOSER bound needs rows the backing never stored
    assertNotRewritten("SELECT g, id FROM (SELECT g, id, v, " +
      "row_number() OVER (PARTITION BY g ORDER BY v DESC, id) AS rn " +
      "FROM mvtk.dbt.t) s WHERE rn <= 7")
    // a different ORDER BY is a different ranking
    assertNotRewritten("SELECT g, id FROM (SELECT g, id, v, " +
      "row_number() OVER (PARTITION BY g ORDER BY v ASC, id) AS rn " +
      "FROM mvtk.dbt.t) s WHERE rn <= 3")
    // a filter BELOW the window changes every rank — never subsumed
    assertNotRewritten("SELECT g, id FROM (SELECT g, id, v, " +
      "row_number() OVER (PARTITION BY g ORDER BY v DESC, id) AS rn " +
      "FROM mvtk.dbt.t WHERE v > 50) s WHERE rn <= 3")
    // navigation survives churn + the incremental refresh
    cat.deleteMoR("dbt", "t", col("v") > 95L)
    cat.append("dbt", "t",
      Seq(("1", 1001L, 100L), ("2", 1002L, 100L)).toDF("g", "id", "v"))
    val (m, _) = cat.refreshMaterializedView("dbt", "top5")
    assert(m == "incremental_topk", m)
    val q = "SELECT g, id, v, rn FROM (SELECT g, id, v, row_number() OVER " +
      "(PARTITION BY g ORDER BY v DESC, id) AS rn FROM mvtk.dbt.t) s " +
      "WHERE rn <= 4 ORDER BY g, rn"
    assertRewritten(q) // result-compared against the rewrite-off truth
  }

  test("sidecar rollup keeps all-NULL groups alive") {
    val cat = freshCat("mvr3")
    val df = (Seq(
      ("a", "x", Option(1L)), ("a", "x", Option(1L)), ("a", "y", Option(2L)),
      ("b", "x", Option(1L)), ("b", "y", Option(3L)),
      // group c exists but every value is NULL: count(DISTINCT)=0,
      // sum(DISTINCT)=NULL — the group must SURVIVE the sidecar rollup
      ("c", "x", Option.empty[Long]), ("c", "y", Option.empty[Long])))
      .toDF("k1", "k2", "v")
    cat.createTable("db3", "fact", df.schema)
    cat.append("db3", "fact", df)
    cat.createMaterializedView("db3", "dv2",
      "SELECT k1, k2, count(DISTINCT v) AS cd, count(*) AS n " +
        "FROM mvr3.db3.fact GROUP BY k1, k2")
    assertRewritten("SELECT k1, count(DISTINCT v) AS c, sum(DISTINCT v) AS s " +
      "FROM mvr3.db3.fact GROUP BY k1")
    // and the residual key filter applies on BOTH the sidecar and the
    // group-existence read
    assertRewritten("SELECT k1, count(DISTINCT v) AS c FROM mvr3.db3.fact " +
      "WHERE k2 = 'x' GROUP BY k1")
    // value shared across the collapsed k2 subgroups counts ONCE
    spark.conf.set("spark.graft.mv.rewrite.enabled", "true")
    val got = spark.sql("SELECT k1, count(DISTINCT v) AS c FROM mvr3.db3.fact " +
      "GROUP BY k1 ORDER BY k1").as[(String, Long)].collect().toSeq
    assert(got == Seq(("a", 2L), ("b", 2L), ("c", 0L)), got.toString)
  }
}
