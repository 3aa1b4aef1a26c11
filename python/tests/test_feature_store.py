"""End-to-end test of the Python binding: the same lifecycle fixtures as
src/test/scala/graft/FeatureStoreSpec.scala (themselves ports of the
reference's tests/test_core.py:54-116), driven through the
``graft_store`` wrapper AND the SQL surface in one PySpark session.

Run from the repo root (after ``sbt compile``)::

    python3 python/tests/test_feature_store.py

Plain asserts, no pytest dependency — the script exits non-zero on the
first failure and prints PASS lines per case, mirroring how the repo's
other out-of-harness evidence runners report.
"""

import datetime
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import Row, SparkSession

from graft_store import (
    FeatureStore,
    FeatureTableNotFoundError,
    FeatureValidationError,
)

CLASSES = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..",
                 "target", "scala-2.13", "classes"))


def ts(s):
    return datetime.datetime.fromisoformat(s)


def sample_features(spark):
    # SparkTestBase.sampleFeatures, byte for byte
    return spark.createDataFrame(
        [
            ("user_1", ts("2024-01-01"), 1.0, 100),
            ("user_1", ts("2024-01-15"), 2.0, 200),
            ("user_1", ts("2024-02-01"), 3.0, 300),
            ("user_2", ts("2024-01-01"), 10.0, 1000),
            ("user_2", ts("2024-01-20"), 20.0, 2000),
        ],
        "entity_id string, timestamp timestamp, feature_a double, feature_b long",
    )


def single_row(spark, value):
    return spark.createDataFrame(
        [("user_1", ts("2024-01-01"), value)],
        "entity_id string, timestamp timestamp, val double",
    )


PASSED = 0


def check(label, cond):
    global PASSED
    if not cond:
        print(f"FAIL {label}")
        sys.exit(1)
    PASSED += 1
    print(f"PASS {label}")


def main():
    if not os.path.isdir(CLASSES):
        print(f"FAIL classpath: {CLASSES} missing - run `sbt compile` first")
        return 1
    root = tempfile.mkdtemp(prefix="graft_pytest_")
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("graft-python-binding-test")
        .config("spark.driver.extraClassPath", CLASSES)
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    try:
        # --- init (FeatureStoreSpec "default max_versions is 10") ---
        check("default max_versions is 10",
              FeatureStore(spark, root=root).max_versions == 10)
        try:
            FeatureStore(spark, root=root, max_versions=0)
            check("max_versions < 1 rejected", False)
        except FeatureValidationError:
            check("max_versions < 1 rejected", True)

        store = FeatureStore(spark, root=root, max_versions=5)

        # --- register returns correct metadata ---
        info = store.register("user_features", sample_features(spark))
        check("register returns correct metadata",
              info.name == "user_features" and info.version == 1
              and info.row_count == 5
              and set(info.columns) ==
              {"entity_id", "timestamp", "feature_a", "feature_b"}
              and store.table_names == ["user_features"])

        # --- re-register increments version ---
        check("re-register increments version",
              store.register("t", single_row(spark, 1.0)).version == 1
              and store.register("t", single_row(spark, 2.0)).version == 2)

        # --- register rejects missing required columns ---
        bad = spark.createDataFrame([(1, 2)], "x int, y int")
        try:
            store.register("bad", bad)
            check("register rejects missing required columns", False)
        except FeatureValidationError:
            check("register rejects missing required columns", True)

        # --- register rejects empty DataFrame ---
        try:
            store.register("empty", sample_features(spark).limit(0))
            check("register rejects empty DataFrame", False)
        except FeatureValidationError:
            check("register rejects empty DataFrame", True)

        # --- get round-trips through parquet storage ---
        store.register("f", sample_features(spark))
        rows = store.get("f", ["user_1"], ts("2024-01-20")).collect()
        check("get round-trips through parquet storage",
              len(rows) == 1 and rows[0]["feature_a"] == 2.0
              and list(rows[0].asDict().keys()) ==
              ["entity_id", "timestamp", "feature_a", "feature_b"])

        # --- string timestamp accepted too (O25 coercion) ---
        rows2 = store.get("f", ["user_1"], "2024-01-20").collect()
        check("string timestamp accepted",
              [r.asDict() for r in rows2] == [r.asDict() for r in rows])

        # --- column projection ---
        got = store.get("f", ["user_1"], "2024-01-20", columns=["feature_a"])
        check("get with column projection",
              got.columns == ["entity_id", "timestamp", "feature_a"])

        # --- get on unknown table raises with available-tables message ---
        try:
            store.get("nope", ["u"], "2024-01-01")
            check("get on unknown table raises", False)
        except FeatureTableNotFoundError as e:
            check("get on unknown table raises", "f" in str(e))

        # --- get_training_set through the store ---
        spine = spark.createDataFrame(
            [("user_1", ts("2024-01-20")), ("user_2", ts("2024-01-15"))],
            "entity_id string, timestamp timestamp",
        )
        out = store.get_training_set("f", spine).collect()
        check("get_training_set through the store",
              len(out) == 2 and
              {r["entity_id"]: r["feature_a"] for r in out} ==
              {"user_1": 2.0, "user_2": 10.0})

        # --- max_age_seconds drops stale matches ---
        aged = store.get_training_set("f", spine, max_age_seconds=3600)
        check("get_training_set max_age drops stale", aged.count() == 0)

        # --- get_version time travel ---
        v1 = store.get_version("t", 1).collect()
        v2 = store.get_version("t", 2).collect()
        check("get_version time travel",
              v1[0]["val"] == 1.0 and v2[0]["val"] == 2.0)
        try:
            store.get_version("t", 99)
            check("get_version unknown raises", False)
        except FeatureTableNotFoundError as e:
            check("get_version unknown raises", "99" in str(e))

        # --- list_tables / get_table_info ---
        names = {i.name for i in store.list_tables()}
        check("list_tables", {"user_features", "t", "f"} <= names)
        ti = store.get_table_info("t")
        check("get_table_info",
              ti.version == 2 and ti.row_count == 1
              and ti.updated_at >= ti.registered_at > 1e9)

        # --- delete returns bool, never throws ---
        check("delete returns True then False",
              store.delete("t") is True and store.delete("t") is False)
        check("deleted table leaves table_names",
              "t" not in store.table_names)

        # --- beyond-reference surfaces ---
        info2 = store.register_append(
            "f",
            spark.createDataFrame(
                [("user_9", ts("2024-02-10"), 9.0, 900)],
                "entity_id string, timestamp timestamp, feature_a double, feature_b long",
            ),
        )
        check("register_append bumps version O(delta)",
              info2.version == 2 and info2.row_count == 6)
        check("scan_where with data skipping",
              store.scan_where("f", "entity_id = 'user_9'").count() == 1)
        check("get_version_as_of time travel",
              store.get_version_as_of("f", "2100-01-01").count() == 6)
        hist = store.get_table_history("f")
        check("get_table_history",
              [h["version"] for h in hist] == [1, 2]
              and hist[-1]["is_current"] is True
              and hist[-1]["rows"] == 6)
        view = store.get_feature_view(spine, ["f"])
        check("get_feature_view prefixes and keeps spine rows",
              view.count() == 2 and "f_feature_a" in view.columns)
        recent = store.get_recent("f", ["user_1"], "2024-03-01", 2).collect()
        check("get_recent ranks latest-first under the PIT cutoff",
              [(r["recency_rank"], r["feature_a"]) for r in
               sorted(recent, key=lambda r: r["recency_rank"])] ==
              [(1, 3.0), (2, 2.0)])
        wf = store.get_window_features(
            "f", spine, 30 * 86400,
            [("cnt_30d", "count", "feature_a", None)]).collect()
        check("get_window_features counts in-window rows per spine row",
              {r["entity_id"]: r["cnt_30d"] for r in wf} ==
              {"user_1": 2, "user_2": 1})
        sess = store.get_sessions("f", gap_seconds=86400 * 10).collect()
        check("get_sessions splits on the gap",
              len(sess) >= 2 and
              {"session_seq", "session_start", "session_end", "n_events"}
              <= set(sess[0].asDict().keys()))

        # --- write-path extensions: upsert / delete_rows / expectations ---
        up = store.register_upsert(
            "f",
            spark.createDataFrame(
                [("user_9", ts("2024-02-10"), 9.5, 950),   # replaces
                 ("user_7", ts("2024-02-15"), 7.5, 750)],  # appends
                "entity_id string, timestamp timestamp, feature_a double, feature_b long",
            ),
        )
        check("register_upsert replaces matched keys and appends new",
              up.version == 3 and up.row_count == 7 and
              store.scan_where("f", "entity_id = 'user_9' AND feature_a = 9.5")
              .count() == 1)
        dr = store.delete_rows("f", "entity_id = 'user_7'")
        check("delete_rows mints a copy-on-write version",
              dr.version == 4 and dr.row_count == 6 and
              store.scan_where("f", "entity_id = 'user_7'").count() == 0)
        try:
            store.delete_rows("f", "1 = 1")
            check("delete_rows rejects deleting every row", False)
        except FeatureValidationError:
            check("delete_rows rejects deleting every row", True)

        # --- CDC + restore surface ---
        feed = store.get_changes("f", 3, 4).collect()
        check("get_changes surfaces the delete commit's rows",
              len(feed) == 1 and feed[0]["_change_type"] == "delete" and
              feed[0]["entity_id"] == "user_7" and
              feed[0]["_commit_version"] == 4)
        creation = store.get_changes("f", 0, 1).collect()
        check("get_changes since creation replays v1 as inserts",
              len(creation) == 5 and
              {r["_change_type"] for r in creation} == {"insert"})
        wide = store.get_changes_between("f", "2000-01-01", "2100-01-01")
        check("get_changes_between resolves endpoints like time travel",
              wide.count() == store.get_changes("f", 0, 4).count())
        rv = store.restore_version("f", 3)
        check("restore_version re-references the old manifest",
              rv.version == 5 and rv.row_count == 7 and
              store.scan_where("f", "entity_id = 'user_7'").count() == 1)
        undo = store.get_changes("f", 4, 5).collect()
        check("restore feed is the net inverse of the undone interval",
              len(undo) == 1 and undo[0]["_change_type"] == "insert" and
              undo[0]["entity_id"] == "user_7")
        good, quar = store.register_with_expectations(
            "gated",
            spark.createDataFrame(
                [("user_1", ts("2024-01-01"), 1.0),
                 ("user_2", ts("2024-01-02"), -5.0)],
                "entity_id string, timestamp timestamp, val double",
            ),
            [("val_nonneg", "val >= 0")],
            quarantine="gated_bad",
        )
        check("register_with_expectations splits pass/violate",
              good is not None and good.row_count == 1 and
              quar is not None and quar.row_count == 1 and
              store.scan_where("gated_bad", "violated = 'val_nonneg'")
              .count() == 1)
        try:
            store.register_with_expectations(
                "gated", single_row(spark, 1.0), [], quarantine="gated_bad")
            check("expectation violation surfaces as FeatureValidationError "
                  "(and ValueError)", False)
        except ValueError as e:
            # FeatureValidationError subclasses ValueError (reference
            # raises plain ValueError for argument validation)
            check("expectation violation surfaces as FeatureValidationError "
                  "(and ValueError)", isinstance(e, FeatureValidationError))

        # --- pipeline ops: dedup / ANN / text analysis ---
        docs = spark.createDataFrame(
            [(1, "the quick brown fox jumps over the lazy dog today"),
             (2, "the quick brown fox jumps over the lazy dog today"),
             (3, "entirely different content with no overlap at all here"),
             (4, "short text")],
            "doc_id long, text string",
        )
        groups = {r["keep_id"]: r["n_copies"]
                  for r in store.dedup_exact(docs).collect()}
        check("dedup_exact groups identical texts under the min id",
              groups.get(1) == 2 and groups.get(3) == 1 and groups.get(4) == 1)
        clusters = {r["doc_id"]: r["cluster_id"]
                    for r in store.dedup_clusters(docs).collect()}
        check("dedup_clusters joins identical docs into one component",
              clusters.get(1) == 1 and clusters.get(2) == 1 and
              3 not in clusters)
        emb = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [1.0, 0.1]), (3, [0.0, 1.0])],
            "vec_id long, embedding array<float>",
        )
        nn = store.ann_cosine_topk(emb, query_ids=[1], k=2).collect()
        check("ann_cosine_topk ranks the closest vector first",
              [(r["neighbor_id"], r["rank"]) for r in
               sorted(nn, key=lambda r: r["rank"])] == [(2, 1), (3, 2)])
        all_nn = store.ann_cosine_topk(emb, k=1).collect()
        check("ann_cosine_topk all-queries path yields one row per vector",
              len(all_nn) == 3 and
              {r["query_id"] for r in all_nn} == {1, 2, 3})
        stats = {r["doc_id"]: r for r in store.text_stats(docs).collect()}
        check("text_stats counts chars and tokens",
              stats[4]["n_chars"] == 10 and stats[4]["n_tokens"] == 2 and
              stats[1]["n_distinct_tokens"] == 9)

        # --- the same store through the SQL surface (V2 catalog) ---
        spark.conf.set("spark.sql.catalog.fs", "graft.sources.GraftCatalog")
        spark.conf.set("spark.sql.catalog.fs.root", root)
        sql_rows = spark.sql(
            "SELECT entity_id, feature_a FROM fs.f "
            "WHERE entity_id = 'user_1' ORDER BY timestamp"
        ).collect()
        check("SQL surface reads the wrapper's table",
              [r["feature_a"] for r in sql_rows] == [1.0, 2.0, 3.0])
        spark.sql("INSERT INTO fs.f VALUES "
                  "('user_3', TIMESTAMP '2024-03-01 00:00:00', 7.0, 70)")
        store.refresh()  # the INSERT committed via the catalog's store
        check("SQL INSERT visible through the wrapper",
              store.get("f", ["user_3"], "2024-03-02")
              .collect()[0]["feature_a"] == 7.0)

        print(f"ALL {PASSED} PYTHON BINDING CHECKS GREEN")
        return 0
    finally:
        spark.stop()
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
