"""PySpark-facing binding for the graft feature store.

The reference engine's audience is ``pip install`` Python users
(reference: README.md:18); this package closes that gap for the Spark
re-implementation: the same ``FeatureStore`` surface — ``register`` /
``get`` / ``get_training_set`` / ``get_version`` / ``list_tables`` /
``get_table_info`` / ``delete`` / ``table_names`` / ``max_versions`` —
over PySpark DataFrames instead of pandas.

Everything stays lazy and distributed: a Python ``DataFrame`` and the
JVM ``Dataset`` it wraps are the same plan, so ``register`` ships no
rows through Python and ``get``/``get_training_set`` return distributed
frames whose point-in-time / as-of kernels run in the JVM exactly as
from Scala. The only Python-side work is argument marshalling through
the ``graft.python.PyFeatureStore`` facade.

Usage::

    from graft_store import FeatureStore

    store = FeatureStore(spark, root="/data/fs", max_versions=10)
    store.register("user_features", df)
    snap = store.get("user_features", [1, 2], "2024-01-15 10:30:00")
    train = store.get_training_set("user_features", spine_df)

The classpath must carry the graft jar/classes (e.g.
``spark.driver.extraClassPath``); see ``python/tests`` for a runnable
session recipe.
"""

import datetime as _dt
from dataclasses import dataclass
from typing import Any, List, Optional, Sequence

from py4j.protocol import Py4JJavaError
from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "FeatureStore",
    "FeatureTableInfo",
    "FeatureStoreError",
    "FeatureTableNotFoundError",
    "FeatureValidationError",
]


class FeatureStoreError(Exception):
    """Base exception for feature store errors (reference: store.py:72)."""


class FeatureTableNotFoundError(FeatureStoreError):
    """Raised when a feature table or version is not registered."""


class FeatureValidationError(FeatureStoreError, ValueError):
    """Raised when input data fails validation.

    Also subclasses :class:`ValueError`: the reference raises a plain
    ``ValueError`` for argument-validation failures (e.g.
    ``max_versions < 1``, reference: store.py:107), so code ported from
    it that writes ``except ValueError`` keeps catching these.
    """


@dataclass
class FeatureTableInfo:
    """Metadata about a registered feature table (reference: store.py:31).

    ``registered_at`` / ``updated_at`` are epoch SECONDS (float), the
    reference's convention; the JVM side records epoch millis.
    """

    name: str
    columns: List[str]
    version: int
    row_count: int
    registered_at: float
    updated_at: float


# JVM exception class name (suffix) -> Python type. Py4J surfaces JVM
# exceptions with the class name embedded in the message; re-raise as
# the reference-named Python exception so callers can except precisely.
_ERROR_MAP = {
    "FeatureTableNotFoundError": FeatureTableNotFoundError,
    "FeatureValidationError": FeatureValidationError,
    "FeatureConcurrencyError": FeatureStoreError,
    "FeatureStorageError": FeatureStoreError,
}


def _translate(err: Py4JJavaError) -> Exception:
    jexc = err.java_exception
    jclass = jexc.getClass().getName()
    message = jexc.getMessage() or str(err)
    for suffix, pytype in _ERROR_MAP.items():
        if jclass.endswith(suffix):
            return pytype(message)
    return err


def _ts_arg(timestamp: Any) -> Any:
    """Coerce a Python timestamp-ish value to what the JVM boundary
    accepts: datetimes become naive-as-UTC ISO strings (the store's
    documented convention), strings pass through untouched. A
    timezone-AWARE datetime is converted to UTC first — dropping tzinfo
    and reinterpreting the wall clock as UTC would silently shift every
    point-in-time cutoff by the offset (future-feature leakage, the
    exact bug class a PIT store exists to prevent)."""
    if isinstance(timestamp, _dt.datetime):
        if timestamp.tzinfo is not None:
            timestamp = timestamp.astimezone(_dt.timezone.utc)
        return timestamp.strftime("%Y-%m-%dT%H:%M:%S.%f")
    if isinstance(timestamp, _dt.date):
        return timestamp.isoformat()
    return timestamp


class FeatureStore:
    """Feature store over a Spark session (reference: store.py:84).

    Args:
        spark: the active :class:`~pyspark.sql.SparkSession`.
        root: storage root directory; ``None`` uses the engine default.
        max_versions: retained versions per table (must be >= 1; the
            constructor raises ``FeatureValidationError`` parity-style
            on ``< 1`` — surfaced from the JVM check).
        partition_granularity: ``"month"`` (default) or ``"day"`` —
            the physical time-partitioning of stored versions.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: Optional[str] = None,
        max_versions: int = 10,
        partition_granularity: str = "month",
    ) -> None:
        self._spark = spark
        if int(max_versions) < 1:
            # mirror the reference's eager __init__ check without a JVM
            # round-trip (reference: store.py:103-104)
            raise FeatureValidationError(
                f"max_versions must be >= 1, got {max_versions}"
            )
        try:
            self._j = spark._jvm.graft.python.PyFeatureStore.open(
                spark._jsparkSession, root, int(max_versions),
                partition_granularity,
            )
        except Py4JJavaError as err:  # pragma: no cover - defensive
            raise _translate(err) from None

    # -- properties ----------------------------------------------------

    @property
    def max_versions(self) -> int:
        return self._j.maxVersions()

    @property
    def table_names(self) -> List[str]:
        return list(self._j.tableNames())

    # -- core API ------------------------------------------------------

    def register(self, name: str, df: DataFrame, description: str = "") -> FeatureTableInfo:
        """Register (or version-bump) a feature table from a DataFrame."""
        try:
            return self._info(self._j.register(name, df._jdf, description))
        except Py4JJavaError as err:
            raise _translate(err) from None

    def get(
        self,
        name: str,
        entity_ids: Sequence[Any],
        timestamp: Any,
        columns: Optional[Sequence[str]] = None,
    ) -> DataFrame:
        """Point-in-time snapshot: latest row per entity at/before
        ``timestamp``, restricted to ``entity_ids``."""
        try:
            jdf = self._j.get(
                name, list(entity_ids), _ts_arg(timestamp),
                list(columns) if columns is not None else None,
            )
            return self._wrap(jdf)
        except Py4JJavaError as err:
            raise _translate(err) from None

    def get_training_set(
        self,
        name: str,
        entity_timestamps: DataFrame,
        columns: Optional[Sequence[str]] = None,
        max_age_seconds: Optional[int] = None,
    ) -> DataFrame:
        """As-of join: for each spine row (entity_id, timestamp), the
        latest feature row at/before that timestamp; non-matches drop."""
        try:
            jdf = self._j.getTrainingSet(
                name, entity_timestamps._jdf,
                list(columns) if columns is not None else None,
                None if max_age_seconds is None else int(max_age_seconds),
            )
            return self._wrap(jdf)
        except Py4JJavaError as err:
            raise _translate(err) from None

    def get_version(self, name: str, version: int) -> DataFrame:
        """A specific retained version of a table (time travel)."""
        try:
            return self._wrap(self._j.getVersion(name, int(version)))
        except Py4JJavaError as err:
            raise _translate(err) from None

    def list_tables(self) -> List[FeatureTableInfo]:
        return [self._info(m) for m in self._j.listTables()]

    def get_table_info(self, name: str) -> FeatureTableInfo:
        try:
            return self._info(self._j.getTableInfo(name))
        except Py4JJavaError as err:
            raise _translate(err) from None

    def delete(self, name: str) -> bool:
        """Drop a table; ``False`` (never an exception) when absent."""
        return bool(self._j.delete(name))

    def refresh(self) -> None:
        """Re-read the on-disk catalog — picks up tables/versions
        committed by other sessions or surfaces (e.g. SQL ``INSERT``
        through the V2 catalog) since this handle opened."""
        self._j.refresh()

    # -- beyond-reference surfaces (Spark-native extensions) -----------

    def register_append(
        self, name: str, df: DataFrame, merge_schema: bool = False
    ) -> FeatureTableInfo:
        """O(delta) append: a new version referencing prior segments plus
        this batch — no rewrite of existing data. ``merge_schema=True``
        allows new columns (prior segments read them as typed nulls)."""
        try:
            return self._info(
                self._j.registerAppend(name, df._jdf, bool(merge_schema)))
        except Py4JJavaError as err:
            raise _translate(err) from None

    def register_upsert(
        self, name: str, df: DataFrame, merge_schema: bool = False
    ) -> FeatureTableInfo:
        """Key-wise merge: rows in ``df`` whose ``(entity_id, timestamp)``
        matches a current row REPLACE it; the rest append — one O(delta)
        commit (only segments containing matched keys rewrite)."""
        try:
            return self._info(
                self._j.registerUpsert(name, df._jdf, bool(merge_schema)))
        except Py4JJavaError as err:
            raise _translate(err) from None

    def delete_rows(self, name: str, condition_sql: str) -> FeatureTableInfo:
        """Copy-on-write delete of rows matching the SQL boolean
        expression; mints a new version (a no-match delete is a no-op,
        deleting every row is rejected — use :meth:`delete`)."""
        try:
            return self._info(self._j.deleteRows(name, condition_sql))
        except Py4JJavaError as err:
            raise _translate(err) from None

    def register_with_expectations(
        self,
        name: str,
        df: DataFrame,
        expectations: Sequence[Sequence[str]],
        quarantine: str,
    ) -> "tuple[Optional[FeatureTableInfo], Optional[FeatureTableInfo]]":
        """Expectation-gated ingestion: each expectation is a
        ``(label, predicate_sql)`` pair; passing rows land in ``name``,
        violating rows in ``quarantine`` with a ``violated`` label
        column. Returns ``(table_info, quarantine_info)`` — ``None`` on
        a side where no rows landed (no empty versions are minted)."""
        try:
            exps = [[str(label), str(pred)] for label, pred in expectations]
            m = self._j.registerWithExpectations(
                name, df._jdf, exps, quarantine)
            t = m.get("table")
            q = m.get("quarantine")
            return (
                self._info(t) if t is not None else None,
                self._info(q) if q is not None else None,
            )
        except Py4JJavaError as err:
            raise _translate(err) from None

    def scan_where(self, name: str, condition_sql: str) -> DataFrame:
        """Filtered read of the current version with segment-stats data
        skipping; ``condition_sql`` is a SQL boolean expression."""
        try:
            return self._wrap(self._j.scanWhere(name, condition_sql))
        except Py4JJavaError as err:
            raise _translate(err) from None

    def get_version_as_of(self, name: str, timestamp: Any) -> DataFrame:
        """TIMESTAMP AS OF time travel over the retained commit history."""
        try:
            return self._wrap(self._j.getVersionAsOf(name, _ts_arg(timestamp)))
        except Py4JJavaError as err:
            raise _translate(err) from None

    def get_changes(
        self, name: str, from_version: int, to_version: int
    ) -> DataFrame:
        """CDC read: the change rows (``_change_type`` insert/delete,
        ``_commit_version``) committed after ``from_version`` up to and
        including ``to_version``; ``from_version = 0`` means since
        creation. Apply the insert/delete rows downstream instead of
        re-reading snapshots."""
        try:
            return self._wrap(self._j.getChanges(
                name, int(from_version), int(to_version)))
        except Py4JJavaError as err:
            raise _translate(err) from None

    def get_changes_between(
        self, name: str, from_timestamp: Any, to_timestamp: Any
    ) -> DataFrame:
        """:meth:`get_changes` addressed by wall-clock commit time —
        both endpoints resolve like TIMESTAMP AS OF."""
        try:
            return self._wrap(self._j.getChangesBetween(
                name, _ts_arg(from_timestamp), _ts_arg(to_timestamp)))
        except Py4JJavaError as err:
            raise _translate(err) from None

    def restore_version(self, name: str, version: int) -> FeatureTableInfo:
        """RESTORE TO VERSION: mint a new version whose content is
        exactly the retained historical ``version`` — metadata-only,
        no data copied; the rolled-over versions stay in history."""
        try:
            return self._info(self._j.restoreVersion(name, int(version)))
        except Py4JJavaError as err:
            raise _translate(err) from None

    def get_feature_view(
        self, spine: DataFrame, names: Sequence[str]
    ) -> DataFrame:
        """Multi-table left as-of view over the spine; feature columns
        come back prefixed ``<table>_``; every spine row survives."""
        try:
            return self._wrap(self._j.getFeatureView(spine._jdf, list(names)))
        except Py4JJavaError as err:
            raise _translate(err) from None

    def get_recent(
        self, name: str, entity_ids: Sequence[Any], timestamp: Any, k: int
    ) -> DataFrame:
        """The ``k`` most recent rows per entity at/before ``timestamp``,
        each tagged with a 1-based ``recency_rank``."""
        try:
            return self._wrap(self._j.getRecent(
                name, list(entity_ids), _ts_arg(timestamp), int(k)))
        except Py4JJavaError as err:
            raise _translate(err) from None

    def get_window_features(
        self,
        name: str,
        entity_timestamps: DataFrame,
        window_seconds: int,
        aggs: Sequence[tuple],
    ) -> DataFrame:
        """Windowed aggregates per spine row: ``aggs`` is a sequence of
        ``(out_name, fn, input_col, window_seconds_override_or_None)``
        with fn in rows/count/sum/min/max/distinct. One entity-keyed
        shuffle computes every horizon."""
        try:
            jaggs = [[str(o), str(f), None if i is None else str(i),
                      None if w is None else int(w)]
                     for (o, f, i, w) in aggs]
            return self._wrap(self._j.getWindowFeatures(
                name, entity_timestamps._jdf, int(window_seconds), jaggs))
        except Py4JJavaError as err:
            raise _translate(err) from None

    def get_sessions(self, name: str, gap_seconds: int) -> DataFrame:
        """Gap-split sessions over the stored table (session bounds,
        row counts, duration per entity session)."""
        try:
            return self._wrap(self._j.getSessions(name, int(gap_seconds)))
        except Py4JJavaError as err:
            raise _translate(err) from None

    def get_table_history(self, name: str) -> List[dict]:
        """Retained version history, oldest first (DESCRIBE HISTORY)."""
        try:
            out = []
            for m in self._j.getTableHistory(name):
                d = dict(m)
                d["columns"] = list(d["columns"])
                if d.get("committed_at") is not None:
                    d["committed_at"] = d["committed_at"] / 1000.0
                out.append(d)
            return out
        except Py4JJavaError as err:
            raise _translate(err) from None

    # -- pipeline ops (dedup / ANN / text analysis) ---------------------
    #
    # Stateless DataFrame -> DataFrame kernels from the training-data
    # pipeline surface, reachable without writing Scala. Everything
    # stays lazy and distributed; no rows cross Python.

    def dedup_exact(
        self,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> DataFrame:
        """Exact duplicate groups by content hash: one row per distinct
        text with ``content_hash``, the canonical survivor ``keep_id``
        (min id) and ``n_copies``."""
        try:
            return self._wrap(self._j.dedupExact(docs._jdf, id_col, text_col))
        except Py4JJavaError as err:
            raise _translate(err) from None

    def dedup_clusters(
        self,
        docs: DataFrame,
        num_perms: int = 16,
        rows_per_band: int = 4,
        shingle_width: int = 3,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> DataFrame:
        """MinHash+LSH near-duplicate clusters: banded signatures ->
        candidate pairs -> connected components. Returns one
        ``(doc_id, cluster_id)`` row per clustered document, with
        ``cluster_id`` the component's min doc id; documents with no
        near-duplicate do not appear."""
        try:
            return self._wrap(self._j.dedupClusters(
                docs._jdf, id_col, text_col, int(num_perms),
                int(rows_per_band), int(shingle_width)))
        except Py4JJavaError as err:
            raise _translate(err) from None

    def ann_cosine_topk(
        self,
        emb: DataFrame,
        query_ids: Optional[Sequence[int]] = None,
        k: int = 10,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        """Exact cosine top-k neighbors per query: ``query_ids=None``
        ranks EVERY vector against every other (corpus-broadcast
        bounded-buffer plan — the scale path); otherwise only the given
        ids' rows are queries. Returns ``(query_id, neighbor_id, score,
        rank)``; zero-norm vectors are excluded (no cosine)."""
        try:
            jids = None if query_ids is None else [int(q) for q in query_ids]
            return self._wrap(self._j.annCosineTopK(
                emb._jdf, jids, int(k), id_col, vec_col))
        except Py4JJavaError as err:
            raise _translate(err) from None

    def text_stats(
        self,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> DataFrame:
        """Per-document token statistics: ``n_chars``, ``n_tokens``
        (whitespace), ``n_distinct_tokens``, ``avg_token_len``,
        ``n_tokens_bpe`` (BPE-ish regex count)."""
        try:
            return self._wrap(self._j.textStats(docs._jdf, id_col, text_col))
        except Py4JJavaError as err:
            raise _translate(err) from None

    # -- plumbing ------------------------------------------------------

    def _wrap(self, jdf) -> DataFrame:
        return DataFrame(jdf, self._spark)

    @staticmethod
    def _info(jmap) -> FeatureTableInfo:
        return FeatureTableInfo(
            name=jmap["name"],
            columns=list(jmap["columns"]),
            version=int(jmap["version"]),
            row_count=int(jmap["row_count"]),
            registered_at=jmap["registered_at"] / 1000.0,
            updated_at=jmap["updated_at"] / 1000.0,
        )
