"""Persistent IVF index store: build once, append increments, query
with partition-pruned probes.

X88 (r14) — the missing persistence rung of the ANN ladder
(brute → LSH → IVF → PQ, all ephemeral until now): a production
retrieval pipeline does not recluster 10⁹ vectors per nightly ingest
or rescan the corpus per query.  The store is the FAISS practice
(train once, `add()` increments, probe cells at query time) expressed
in Spark's storage model:

* ``centroids/`` — one tiny parquet of the deterministic training
  result (the md5-rule vectors of the BUILD corpus, quantized, with
  norms) — the artifact every later assign/query reuses, so appends
  never re-train (exactly FAISS `IndexIVF.is_trained`);
* ``cells/cell=<cid>/`` — the inverted lists: (vec_id, v, n2) rows
  HIVE-PARTITIONED BY CELL, so a query that probes ``n_probe`` of
  ``n_centroids`` cells reads ``n_probe/n_centroids`` of the data —
  the partition filter IS the inverted-file seek, visible in the scan
  plan (``PartitionFilters``), not an in-memory fiction.

Scale shape: build/append are one Arrow assignment scan (the shared
``_ivf_probes_arrow`` engine — per-row cost one matmul row,
centroids on a Spark broadcast) plus one partitioned write; queries
collect the tiny centroid table, compute probe cells driver-side for
the (small, by contract) query set, and the candidate join touches
only the probed partitions.  Nothing reclusters, nothing rescans.

Consistency contract (pytest-pinned): ``ivf_store_topk`` after
``build(A)`` equals ``ivf_topk(A)`` row-for-row (same centroid rule,
same tie-breaks); after ``append(B)`` it equals ``ivf_topk`` run with
A's centroids over A∪B — i.e. the append extends the INDEX without
silently changing the geometry, the exact FAISS `add()` semantics.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from genie_spark.session import local_rows_df
from genie_spark.analytics.similarity import (
    N_CENTROIDS,
    N_PROBE,
    _centroid_rows,
    _ivf_centroid_broadcast,
    _ivf_probes_arrow,
    dot,
)


def _meta_path(store_path: str) -> str:
    return os.path.join(store_path, "_ivf_meta.json")


def _write_cells(assigned: DataFrame, store_path: str, mode: str) -> None:
    (
        assigned.select("vec_id", "v", "n2", "cell")
        .repartition("cell")
        .write.mode(mode)
        .partitionBy("cell")
        .parquet(os.path.join(store_path, "cells"))
    )


def ivf_store_build(
    df: DataFrame,
    store_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = N_CENTROIDS,
) -> dict:
    """Train + load the store from the build corpus: the md5-rule
    centroids land in ``centroids/``, every vector's (v, n2, cell)
    row in the cell-partitioned inverted lists.  Returns a small
    manifest dict (also journaled to ``_ivf_meta.json``)."""
    spark = df.sparkSession
    cent_rows = _centroid_rows(df, id_col, vec_col, n_centroids)
    if not cent_rows:
        raise ValueError("ivf_store_build: no usable vectors to train on")
    os.makedirs(store_path, exist_ok=True)
    local_rows_df(
        spark,
        [(int(r["cid"]), list(r["v"])) for r in cent_rows],
        "cid long, v array<long>",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(store_path, "centroids")
    )
    assigned = _assign_or_raise(
        df, id_col, vec_col, cent_rows, what="build"
    )
    _write_cells(assigned, store_path, "overwrite")
    meta = {
        "n_centroids": len(cent_rows),
        "dim": len(cent_rows[0]["v"]),
        "id_col": id_col,
        "vec_col": vec_col,
    }
    with open(_meta_path(store_path), "w") as f:
        json.dump(meta, f)
    return meta


def _assign_or_raise(
    df: DataFrame, id_col: str, vec_col: str, cent_rows: list, what: str
) -> DataFrame:
    """Cell assignment with a silent-loss guard: the Arrow engine
    keep-filters mis-dimensioned/non-finite vectors, so an input batch
    whose vectors don't match the stored geometry would assign ZERO
    rows and a bare append would 'succeed' while the index silently
    misses the whole batch (r14 code-review finding).  Materialize
    the assignment once and raise loudly on the empty-out/non-empty-in
    combination instead."""
    assigned = (
        _ivf_probes_arrow(df, id_col, vec_col, cent_rows, 1, carry_vec=True)
        .select(F.col("vid").alias("vec_id"), "v", "n2", "cell")
        .localCheckpoint(eager=True)
    )
    if assigned.isEmpty() and not df.isEmpty():
        raise ValueError(
            f"ivf_store_{what}: no input vector matched the index "
            f"geometry (dim={len(cent_rows[0]['v'])}, finite values) — "
            "refusing to silently drop the batch"
        )
    return assigned


def _load_centroids(spark, store_path: str) -> list:
    rows = (
        spark.read.parquet(os.path.join(store_path, "centroids"))
        .orderBy("cid")
        .collect()
    )
    if not rows:
        raise ValueError(f"ivf store at {store_path}: empty centroid table")
    return rows


def ivf_store_append(
    df_new: DataFrame,
    store_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """FAISS ``add()``: assign the new vectors against the STORED
    centroids (no re-training — the index geometry is an artifact,
    not a function of the latest batch) and append to the inverted
    lists.  Caller owns id uniqueness across batches (the upsert
    stores' manifest discipline; an ANN index has no key semantics)."""
    spark = df_new.sparkSession
    cent_rows = _load_centroids(spark, store_path)
    assigned = _assign_or_raise(
        df_new, id_col, vec_col, cent_rows, what="append"
    )
    _write_cells(assigned, store_path, "append")
    return {"appended_cells": True, "n_centroids": len(cent_rows)}


def ivf_store_topk(
    spark,
    store_path: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_probe: int = N_PROBE,
    max_query_rows: int | None = 50_000,
) -> DataFrame:
    """Top-k from the store: probe cells come from the stored
    centroids (same Arrow engine, same tie-breaks as ``ivf_topk``),
    and the inverted-list scan carries ``cell IN (probed)`` as a
    PARTITION filter — the reader touches only n_probe/n_centroids of
    the stored files.  Returns (query_id, neighbor_id, rank, cosine),
    the ``ivf_topk`` schema.

    The probe set rides a broadcast AND a driver-side cell collect, so
    the query frame must be small BY CONTRACT — ``max_query_rows``
    (VERDICT r14 item 2) enforces that contract at runtime with a loud
    raise, the ``semantic_decontaminate`` discipline, instead of
    letting a corpus-sized query set collect onto the driver.  Pass
    ``max_query_rows=None`` to override deliberately."""
    if max_query_rows is not None:
        n = queries.limit(int(max_query_rows) + 1).count()
        if n > max_query_rows:
            raise ValueError(
                f"ivf_store_topk: query set exceeds max_query_rows="
                f"{max_query_rows} — the probe set must stay broadcast-"
                "and-driver-sized. Batch the queries, or pass "
                "max_query_rows=None to override."
            )
    cent_rows = _load_centroids(spark, store_path)
    bc = _ivf_centroid_broadcast(queries, cent_rows)
    probes = (
        _ivf_probes_arrow(
            queries, id_col, vec_col, cent_rows, n_probe, carry_vec=True,
            bc=bc,
        )
        .select(
            F.col("vid").alias("query_id"),
            F.col("v").alias("q_v"),
            F.col("n2").alias("q_n"),
            "cell",
        )
        # materialize ONCE: the probe set is read twice (the driver
        # collect below and the broadcast join) — without this a
        # nondeterministic query frame could probe different cells on
        # the second execution and silently lose candidates behind the
        # partition filter (r14 code-review finding)
        .localCheckpoint(eager=True)
    )
    probe_cells = sorted(
        {int(r["cell"]) for r in probes.select("cell").distinct().collect()}
    )
    cells = (
        spark.read.parquet(os.path.join(store_path, "cells"))
        # partition-pruning filter: Hive-partitioned by cell, so this
        # is a file-listing cut, not a row filter
        .where(F.col("cell").isin(probe_cells))
        .select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("v").alias("n_v"),
            F.col("n2").alias("n_n"),
            "cell",
        )
    )
    cos = F.try_divide(
        dot(F.col("q_v"), F.col("n_v")),
        F.sqrt(F.col("q_n")) * F.sqrt(F.col("n_n")),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        cells.join(F.broadcast(probes), "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )
