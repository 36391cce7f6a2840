"""Persistent MinHash signature store with INCREMENTAL sync.

``minhash_docinfo`` is the expensive step of MinHash+LSH dedup (the
one shingle shuffle — ~90 s per 1 M docs on the local bench); round 9
left it rebuilt from scratch every run, with X20
(``incremental_minhash_pairs``) covering only the QUERY side against a
prebuilt store.  This module is the build side: the docinfo rows live
in a transaction-log table (io/txnlog.py) partitioned by an id-hash
bucket, and ``sync_docinfo_store`` diffs the corpus against the
store's md5 manifest — the reference's own change-detection idiom
(Sage-Bionetworks/Genie genie/input_to_database.py:54-113 compares
entity md5s to skip unchanged inputs) — so ONLY new/changed documents
are ever re-shingled.

Scale posture (100 TB corpus, daily ~1% churn):
  * the manifest diff reads THREE slim columns of the store
    (id, __md5, sig_bucket) — parquet column pruning never touches
    the fat ``__hs`` hash arrays of unchanged docs;
  * the shingle+aggregate recompute runs on the DELTA only;
  * the rewrite is partition-scoped: only buckets containing a
    new/changed/removed doc are rewritten (two-phase staging + the
    txnlog's atomic partition swap — a failed sync never corrupts the
    store), and unchanged docs in those buckets are COPIED from the
    store, not recomputed;
  * short documents (< k chars, no shingles) keep a manifest-only row
    with null signature so they are never re-diagnosed as "new";
    ``read_docinfo_store`` filters them out, which is exactly the
    batch ``minhash_docinfo`` behavior.

Bucket-count sizing: ``n_buckets`` bounds write amplification — a
delta touching d docs rewrites at most min(d, n_buckets) buckets, so
size buckets to the churn you expect (more buckets → smaller
rewrites, more files).  The bucket column is ``pmod(xxhash64(id),
n_buckets)`` — deterministic, engine-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET_COL = "sig_bucket"  # no leading underscore: _-prefixed partition dirs are invisible to the txnlog file walk (hadoop hidden-path convention)
MD5_COL = "__md5"
_META_NAME = "_sigstore_meta.json"


def _check_store_params(store_path: str, want: dict, create: bool) -> None:
    """Pin the signature parameters (family, k, …, n_buckets) to the
    store: a sync with different parameters would silently mix
    signature spaces (stored rows keep the OLD parameters — unchanged
    docs are never recomputed), so a mismatch must fail loudly."""
    import json as _json
    import os as _os

    meta_path = _os.path.join(store_path, _META_NAME)
    if _os.path.isfile(meta_path):
        with open(meta_path) as f:
            have = _json.load(f)
        if have != want:
            raise ValueError(
                f"signature store {store_path} was built with {have}; "
                f"sync called with {want} — signatures are not "
                "comparable across parameters.  Rebuild into a fresh "
                "store instead."
            )
    elif create:
        _os.makedirs(store_path, exist_ok=True)
        with open(meta_path, "w") as f:
            _json.dump(want, f)


def _manifest(
    corpus: DataFrame, id_col: str, text_col: str, n_buckets: int
) -> DataFrame:
    return corpus.select(
        id_col,
        F.col(text_col).alias("__text"),
        F.md5(F.col(text_col)).alias(MD5_COL),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets)).alias(BUCKET_COL),
    )


def sync_docinfo_store(
    spark: SparkSession,
    corpus: DataFrame,
    store_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
    n_perm: int = 16,
    n_buckets: int = 64,
    commit=None,
) -> dict:
    """Bring the MinHash signature store at ``store_path`` in sync
    with ``corpus``, re-shingling ONLY new/changed documents.

    Returns stats: ``mode`` (full / incremental / noop),
    ``delta_rows`` (docs re-shingled), ``removed_rows`` (store docs no
    longer in the corpus), ``buckets_rewritten``.  The corpus must
    satisfy the one-row-per-id contract (checked by ``shingles`` via
    the manifest-diff semantics: a duplicated id would collide in the
    diff join; the docinfo build itself runs with the default sketch
    guard).
    """
    from genie_spark.analytics.dedup import minhash_docinfo

    def build(docs, unique_ids):
        return minhash_docinfo(
            docs, id_col, text_col, k, n_perm, unique_ids=unique_ids
        )

    return _sync_store(
        spark, corpus, store_path, id_col, text_col, n_buckets, commit,
        build, {"family": "minhash", "k": k, "n_perm": n_perm,
                "n_buckets": n_buckets},
    )


def sync_winnow_store(
    spark: SparkSession,
    corpus: DataFrame,
    store_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
    n_buckets: int = 64,
    commit=None,
) -> dict:
    """Winnowing-fingerprint variant of ``sync_docinfo_store``: the
    SAME manifest-diff machinery (md5 change detection, bucket-scoped
    rewrite, explicit empty-bucket commit) over the X49 fingerprint
    family — rows are (id, __fps sorted array, __nfp), ~2/(w+1) the
    size of the X47 anchor stream.  Only new/changed documents are
    re-fingerprinted."""
    from genie_spark.analytics.dedup import winnow_fp_docinfo

    def build(docs, unique_ids):
        return winnow_fp_docinfo(docs, id_col, text_col, k, w)

    return _sync_store(
        spark, corpus, store_path, id_col, text_col, n_buckets, commit,
        build, {"family": "winnow", "k": k, "w": w,
                "n_buckets": n_buckets},
    )


def _sync_store(
    spark: SparkSession,
    corpus: DataFrame,
    store_path: str,
    id_col: str,
    text_col: str,
    n_buckets: int,
    commit,
    build_info,
    want_meta: dict,
) -> dict:
    """Family-generic store sync: ``build_info(docs, unique_ids)``
    returns the one-row-per-id signature rows for a document set; the
    manifest diff / bucket rewrite / commit protocol is identical for
    every family."""
    from pyspark import StorageLevel

    from genie_spark.io.txnlog import LogCommit

    commit = commit or LogCommit()
    commit.recover(store_path)
    _check_store_params(store_path, want_meta, create=True)
    existing = commit.read(spark, store_path)
    man = _manifest(corpus, id_col, text_col, n_buckets)

    if existing is None:
        info = build_info(corpus, None)
        out = man.drop("__text").join(info.hint("merge"), id_col, "left")
        staging = commit.staging_path(store_path)
        out.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(staging)
        commit.commit_partitions(staging, store_path, BUCKET_COL)
        # count AFTER the write, from the committed slim manifest
        # column — counting ``out`` first would run the whole docinfo
        # build twice (count + write)
        n = commit.read(spark, store_path).select(id_col).count()
        return {
            "mode": "full",
            "delta_rows": n,
            "removed_rows": 0,
            "buckets_rewritten": len(
                commit.partition_values(store_path, BUCKET_COL)
            ),
            "n_buckets": n_buckets,
        }

    # manifest diff — slim columns only; the store's fat __hs arrays
    # are never read here (parquet column pruning)
    store_man = existing.select(id_col, MD5_COL, BUCKET_COL)
    delta = man.join(
        store_man.select(id_col, MD5_COL).hint("merge"),
        [id_col, MD5_COL],
        "left_anti",
    ).persist(StorageLevel.MEMORY_AND_DISK)
    removed = store_man.join(
        man.select(id_col, MD5_COL).hint("merge"),
        [id_col, MD5_COL],
        "left_anti",
    ).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        delta_n = delta.count()
        removed_n = removed.count()
        if delta_n == 0 and removed_n == 0:
            return {
                "mode": "noop",
                "delta_rows": 0,
                "removed_rows": 0,
                "buckets_rewritten": 0,
                "n_buckets": n_buckets,
            }
        buckets = sorted(
            r[0]
            for r in delta.select(BUCKET_COL)
            .unionByName(removed.select(BUCKET_COL))
            .distinct()
            .collect()
        )
        # unchanged docs in affected buckets are COPIED (semi-join on
        # the still-current manifest rows), never re-shingled
        keep = existing.where(F.col(BUCKET_COL).isin(buckets)).join(
            man.select(id_col, MD5_COL).hint("merge"),
            [id_col, MD5_COL],
            "left_semi",
        )
        delta_info = delta.drop("__text").join(
            # contract already screened by the manifest diff keys
            build_info(
                delta.select(id_col, F.col("__text").alias(text_col)), True
            ).hint("merge"),
            id_col,
            "left",
        )
        out = keep.unionByName(delta_info)
        staging = commit.staging_path(store_path)
        out.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(staging)
        # explicit bucket scope: a bucket whose every doc was REMOVED
        # stages zero rows (Spark writes no partition dir), so a
        # staging-derived commit scope would leave its old files live
        # — the store would keep pairing against deleted documents
        commit.commit_partitions(
            staging, store_path, BUCKET_COL, partition_values=buckets
        )
        return {
            "mode": "incremental",
            "delta_rows": delta_n,
            "removed_rows": removed_n,
            "buckets_rewritten": len(buckets),
            "n_buckets": n_buckets,
        }
    finally:
        delta.unpersist()
        removed.unpersist()


def read_docinfo_store(
    spark: SparkSession, store_path: str, commit=None
) -> DataFrame:
    """The store as a ``minhash_docinfo``-schema DataFrame: manifest
    bookkeeping columns dropped, manifest-only rows (short docs with
    no shingles) filtered — byte-identical semantics to a fresh
    ``minhash_docinfo`` over the synced corpus."""
    from genie_spark.io.txnlog import LogCommit

    commit = commit or LogCommit()
    df = commit.read(spark, store_path)
    if df is None:
        raise FileNotFoundError(f"no signature store at {store_path}")
    return df.where(F.col("mh_0").isNotNull()).drop(MD5_COL, BUCKET_COL)


def read_winnow_store(
    spark: SparkSession, store_path: str, commit=None
) -> DataFrame:
    """The winnow store as a ``winnow_fp_docinfo``-schema DataFrame:
    manifest columns dropped, manifest-only rows (docs too short to
    fingerprint) filtered."""
    from genie_spark.io.txnlog import LogCommit

    commit = commit or LogCommit()
    df = commit.read(spark, store_path)
    if df is None:
        raise FileNotFoundError(f"no signature store at {store_path}")
    return df.where(F.col("__fps").isNotNull()).drop(MD5_COL, BUCKET_COL)


def winnow_pairs_from_store(
    spark: SparkSession,
    store_path: str,
    id_col: str = "doc_id",
    min_shared: int = 2,
    max_df: int | None = 1_000,
    commit=None,
) -> DataFrame:
    """MOSS pair report from the PERSISTED winnow store — the batch
    ``winnow_dup_pairs`` result without its fingerprinting pass
    (pinned equal by tests/test_analytics.py): explode the stored
    per-doc fingerprint arrays back to the doc-distinct (id, fp)
    stream and run the SAME shared join/cap stage."""
    from genie_spark.analytics.dedup import _winnow_pairs_from_fps

    fps = read_winnow_store(spark, store_path, commit).select(
        id_col, F.explode("__fps").alias("fp")
    )
    return _winnow_pairs_from_fps(fps, id_col, min_shared, max_df)


def minhash_pairs_from_store(
    spark: SparkSession,
    store_path: str,
    id_col: str = "doc_id",
    n_perm: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    commit=None,
) -> DataFrame:
    """Full-corpus MinHash+LSH near-dup pairs from the PERSISTED store
    — the from-scratch ``minhash_dedup_pairs`` result without its
    shingle pass (pinned equal by tests/test_analytics.py)."""
    from pyspark import StorageLevel

    from genie_spark.analytics.dedup import (
        _release_on_gc,
        _verify_pairs,
        lsh_candidate_pairs,
    )

    docinfo = read_docinfo_store(spark, store_path, commit).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    cand = lsh_candidate_pairs(
        docinfo.select(id_col, *[f"mh_{i}" for i in range(n_perm)]),
        id_col,
        n_perm,
        bands,
    )
    return _release_on_gc(
        _verify_pairs(cand, docinfo, id_col, threshold), docinfo
    )


def upsert_docinfo_store(
    spark: SparkSession,
    batch: DataFrame,
    store_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
    n_perm: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    n_buckets: int = 64,
    commit=None,
    on_pairs=None,
) -> dict:
    """UPSERT a batch into the signature store and detect its near-dup
    pairs against the absorbed corpus — the continuous-ingest shape
    (docs absent from the batch are KEPT; a re-delivered identical doc
    is a no-op; a re-delivered CHANGED doc replaces its old signature
    and is re-compared).  Contrast ``sync_docinfo_store``, whose
    contract is "make the store equal this corpus" (absent = removed).

    ``on_pairs(pairs_df)`` is invoked with the batch's near-dup pairs
    (new↔new and new↔store, a < b) BEFORE the store commit — the
    ordering that makes a foreachBatch caller exactly-once: a replayed
    batch whose commit already landed diffs to an empty delta, skips
    the callback, and the previously written pairs survive.  Pairs
    compare the batch only against CURRENT store rows minus the batch
    ids themselves (a changed doc is not compared to its own stale
    signature).

    Returns stats: mode (full / incremental / noop), delta_rows,
    buckets_rewritten, n_buckets.  Raises on duplicated ids INSIDE the
    batch (the store is one-row-per-id by construction; silently
    keeping either row would corrupt every later diff).
    """
    from genie_spark.analytics.dedup import (
        _verify_pairs,
        incremental_minhash_pairs,
        lsh_candidate_pairs,
        minhash_docinfo,
    )

    def detect(store_info, delta_docs):
        if store_info is not None:
            pairs, new_info = incremental_minhash_pairs(
                store_info, delta_docs, id_col, text_col,
                k, n_perm, bands, threshold,
            )
        else:
            new_info = minhash_docinfo(
                delta_docs, id_col, text_col, k, n_perm, unique_ids=True
            ).localCheckpoint(eager=True)
            cand = lsh_candidate_pairs(
                new_info.select(id_col, *[f"mh_{i}" for i in range(n_perm)]),
                id_col, n_perm, bands,
            )
            pairs = _verify_pairs(cand, new_info, id_col, threshold)
        if on_pairs is not None:
            on_pairs(pairs)
        return new_info

    return _upsert_store(
        spark, batch, store_path, id_col, text_col, n_buckets, commit,
        detect, "mh_0",
        {"family": "minhash", "k": k, "n_perm": n_perm,
         "n_buckets": n_buckets},
    )


def upsert_winnow_store(
    spark: SparkSession,
    batch: DataFrame,
    store_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
    min_shared: int = 2,
    max_df: int | None = 1_000,
    n_buckets: int = 64,
    commit=None,
    on_pairs=None,
) -> dict:
    """Winnow-family UPSERT: the continuous-ingest shape of
    ``sync_winnow_store`` (absent docs KEPT, identical re-delivery a
    no-op, changed docs re-fingerprinted) — same manifest-diff and
    bucket-rewrite machinery, property-tested to equal the
    final-state ``winnow_fp_docinfo`` build for ANY batch sequence.

    ``on_pairs(pairs_df)`` (optional) receives the batch's MOSS pair
    report — (a, b, n_shared) with a < b, ≥ ``min_shared`` shared
    fingerprints, new↔new AND new↔store, the batch compared only
    against CURRENT store rows minus its own ids — invoked BEFORE the
    store commit (the ``upsert_docinfo_store`` exactly-once
    ordering)."""
    from genie_spark.analytics.dedup import winnow_fp_docinfo

    def detect(store_info, delta_docs):
        new_info = winnow_fp_docinfo(
            delta_docs, id_col, text_col, k, w
        ).localCheckpoint(eager=True)
        if on_pairs is not None:
            new_fps = new_info.select(
                id_col, F.explode("__fps").alias("fp")
            )
            store_fps = (
                store_info.select(id_col, F.explode("__fps").alias("fp"))
                if store_info is not None
                else None
            )
            on_pairs(
                _winnow_batch_pairs(
                    new_fps, store_fps, id_col, min_shared, max_df
                )
            )
        return new_info

    return _upsert_store(
        spark, batch, store_path, id_col, text_col, n_buckets, commit,
        detect, "__fps",
        {"family": "winnow", "k": k, "w": w, "n_buckets": n_buckets},
    )


def _winnow_batch_pairs(
    new_fps: DataFrame,
    store_fps: DataFrame | None,
    id_col: str,
    min_shared: int,
    max_df: int | None,
) -> DataFrame:
    """Pairs TOUCHING the batch: new↔new (a < b within the batch) plus
    new↔store, counted per shared fingerprint — each shared fp
    contributes exactly once per unordered pair (the new↔store join
    runs one direction; the new↔new self-join is a<b-filtered), so
    n_shared matches the batch ``winnow_dup_pairs`` semantics.  The
    ``max_df`` boilerplate cap applies over the COMBINED stream (a
    fingerprint's corpus frequency, not its batch frequency)."""
    all_fps = (
        new_fps.unionByName(store_fps) if store_fps is not None else new_fps
    )
    if max_df is not None:
        hot = (
            all_fps.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("__d"))
            .where(F.col("__d") > max_df)
            .select("fp")
        )
        new_fps = new_fps.hint("merge").join(
            hot.hint("merge"), "fp", "left_anti"
        )
        if store_fps is not None:
            store_fps = store_fps.hint("merge").join(
                hot.hint("merge"), "fp", "left_anti"
            )
    a = new_fps.select(F.col(id_col).alias("a"), "fp")
    nn = (
        a.hint("merge")
        .join(new_fps.select(F.col(id_col).alias("b"), "fp"), "fp")
        .where(F.col("a") < F.col("b"))
    )
    parts = [nn]
    if store_fps is not None:
        ns = a.hint("merge").join(
            store_fps.select(F.col(id_col).alias("b"), "fp"), "fp"
        ).select(
            F.least("a", "b").alias("a"),
            F.greatest("a", "b").alias("b"),
            "fp",
        )
        parts.append(ns)
    allp = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
    return (
        allp.groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def _upsert_store(
    spark: SparkSession,
    batch: DataFrame,
    store_path: str,
    id_col: str,
    text_col: str,
    n_buckets: int,
    commit,
    detect,
    probe_col: str,
    want_meta: dict,
) -> dict:
    """Family-generic store upsert.  ``detect(store_info, delta_docs)``
    builds the delta's signature rows (and may run the family's pair
    detection against ``store_info`` — the CURRENT store minus the
    batch's own ids, or None on first build)."""
    from pyspark import StorageLevel

    from genie_spark.io.txnlog import LogCommit

    commit = commit or LogCommit()
    commit.recover(store_path)
    _check_store_params(store_path, want_meta, create=True)
    existing = commit.read(spark, store_path)
    man = _manifest(batch, id_col, text_col, n_buckets).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    try:
        chk = man.agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(F.col(id_col)).alias("nd"),
        ).first()
        if chk["n"] != chk["nd"]:
            raise ValueError(
                f"upsert store: batch carries {chk['n'] - chk['nd']}"
                f" duplicated {id_col!r} rows — the store is one-row-per-id;"
                " collapse the batch first"
            )
        if existing is not None:
            delta = man.join(
                existing.select(id_col, MD5_COL).hint("merge"),
                [id_col, MD5_COL],
                "left_anti",
            ).persist(StorageLevel.MEMORY_AND_DISK)
        else:
            delta = man
        delta_n = delta.count()
        if delta_n == 0:
            return {
                "mode": "noop",
                "delta_rows": 0,
                "buckets_rewritten": 0,
                "n_buckets": n_buckets,
            }
        delta_docs = delta.select(id_col, F.col("__text").alias(text_col))
        if existing is not None:
            # current store minus the batch's own ids: a changed doc
            # must not pair with its stale signature.  Delta ids are
            # batch-bounded → broadcast anti-join, store never shuffles.
            store_info = existing.where(
                F.col(probe_col).isNotNull()
            ).drop(MD5_COL, BUCKET_COL).join(
                F.broadcast(delta.select(id_col)), id_col, "left_anti"
            )
        else:
            store_info = None
        new_info = detect(store_info, delta_docs)
        new_rows = delta.drop("__text").join(
            new_info.hint("merge"), id_col, "left"
        )
        staging = commit.staging_path(store_path)
        if existing is None:
            new_rows.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(
                staging
            )
            commit.commit_partitions(staging, store_path, BUCKET_COL)
            return {
                "mode": "full",
                "delta_rows": delta_n,
                "buckets_rewritten": len(
                    commit.partition_values(store_path, BUCKET_COL)
                ),
                "n_buckets": n_buckets,
            }
        buckets = sorted(
            r[0] for r in delta.select(BUCKET_COL).distinct().collect()
        )
        keep = existing.where(F.col(BUCKET_COL).isin(buckets)).join(
            F.broadcast(delta.select(id_col)), id_col, "left_anti"
        )
        out = keep.unionByName(new_rows)
        out.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(staging)
        # every touched bucket here stages ≥1 row (each delta doc
        # writes its own row), but the explicit scope keeps the commit
        # contract uniform with sync_docinfo_store
        commit.commit_partitions(
            staging, store_path, BUCKET_COL, partition_values=buckets
        )
        return {
            "mode": "incremental",
            "delta_rows": delta_n,
            "buckets_rewritten": len(buckets),
            "n_buckets": n_buckets,
        }
    finally:
        man.unpersist()
        if existing is not None:
            try:
                delta.unpersist()
            except Exception:
                pass
