"""Release filter DAG (reference ``run_genie_filters``
genie/database_to_staging.py:1074-1154 + ``configure_maf`` 296-403).

Every filter that is an R/shell subprocess in the reference (MAFinBED,
mutation-in-cis) is a native DataFrame op here, so the whole release is
ONE Spark lineage — filters compose lazily and Catalyst sees across
them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from genie_spark.operators.intervals import containment_join, interval_anti_join
from genie_spark.operators.windows import flag_variants_to_merge

GNOMAD_COLS = [
    "gnomAD_AFR_AF", "gnomAD_AMR_AF", "gnomAD_ASJ_AF", "gnomAD_EAS_AF",
    "gnomAD_FIN_AF", "gnomAD_NFE_AF", "gnomAD_OTH_AF", "gnomAD_SAS_AF",
]
GERMLINE_AF_THRESHOLD = 0.0005  # genie/database_to_staging.py:357


def germline_predicate(cols: list[str] | None = None) -> Column:
    """max(gnomAD AFs, skipna) > 0.0005 ⇒ likely germline ⇒ drop
    (genie/database_to_staging.py:346-374)."""
    cols = cols or GNOMAD_COLS
    exprs = [F.col(c).try_cast("double") for c in cols]
    mx = exprs[0] if len(exprs) == 1 else F.greatest(*exprs)
    return mx.isNotNull() & (mx > GERMLINE_AF_THRESHOLD)


def germline_filter(
    maf: DataFrame, whitelist_hits: DataFrame | None = None, key_cols: list[str] | None = None
) -> DataFrame:
    """Drop germline-frequency variants unless whitelisted (J4 —
    variants contained in known-somatic sites are kept,
    genie/database_to_staging.py:253-292)."""
    present = [c for c in (GNOMAD_COLS) if c in maf.columns]
    if not present:
        return maf
    is_germline = germline_predicate(present)
    if whitelist_hits is None:
        return maf.where(~F.coalesce(is_germline, F.lit(False)))
    keys = key_cols or ["Chromosome", "Start_Position", "Tumor_Sample_Barcode"]
    flagged = maf.withColumn("__germ", F.coalesce(is_germline, F.lit(False)))
    whitelisted = whitelist_hits.select(*keys).distinct().withColumn("__wl", F.lit(True))
    out = flagged.join(whitelisted, keys, "left")
    return out.where(~F.col("__germ") | F.coalesce(F.col("__wl"), F.lit(False))).drop(
        "__germ", "__wl"
    )


def whitelist_hits(
    maf: DataFrame,
    whitelist_bed: DataFrame,
    bin_size: int = 10_000,
) -> DataFrame:
    """Variants fully contained in a whitelist interval (reference
    pyranges containment, genie/database_to_staging.py:271-273)."""
    return containment_join(
        maf,
        whitelist_bed,
        on=["Chromosome"],
        start_left="Start_Position",
        end_left="End_Position",
        start="Start_Position_wl",
        end="End_Position_wl",
        bin_size=bin_size,
        how="left_semi",
    )


def common_variant_filter(maf: DataFrame, filter_col: str = "FILTER") -> DataFrame:
    """Drop rows whose FILTER contains common_variant (P7, reference
    genie/consortium_to_public.py:27-37)."""
    if filter_col not in maf.columns:
        return maf
    return maf.where(
        ~F.coalesce(F.col(filter_col).contains("common_variant"), F.lit(False))
    )


def annotation_success_filter(maf: DataFrame, col: str = "Annotation_Status") -> DataFrame:
    """Keep successfully annotated variants; missing status defaults to
    SUCCESS (P9, genie/database_to_staging.py:361-365)."""
    if col not in maf.columns:
        return maf
    return maf.where(F.coalesce(F.col(col), F.lit("SUCCESS")) == "SUCCESS")


def germline_status_filter(df: DataFrame) -> DataFrame:
    """Drop rows whose *_STATUS column says GERMLINE, case-insensitive
    column resolution (P8, genie/database_to_staging.py:862-881)."""
    status_cols = [c for c in df.columns if c.upper() in ("SV_STATUS", "MUTATION_STATUS", "STATUS")]
    out = df
    for c in status_cols:
        out = out.where(
            F.coalesce(F.upper(F.col(c)) != "GERMLINE", F.lit(True))
        )
    return out


def mafinbed_remove_variants(
    maf: DataFrame,
    bed: DataFrame,
    pad: int = 10,
    bin_size: int = 10_000,
) -> DataFrame:
    """MAF-in-BED (J3, reference R/MAFinBED.R:77-161 via Rscript
    subprocess): per panel, variants not overlapping any padded BED
    interval are the remove set.  Native binned interval anti-join on
    (SEQ_ASSAY_ID, Chromosome).

    ``maf`` needs SEQ_ASSAY_ID attached (join clinical upstream);
    ``pad`` is the assay gene_padding (default 10,
    genie_registry/assay.py:68-71)."""
    return interval_anti_join(
        maf,
        bed.select("SEQ_ASSAY_ID", "Chromosome",
                   F.col("Start_Position").alias("__bed_start"),
                   F.col("End_Position").alias("__bed_end")),
        on=["SEQ_ASSAY_ID", "Chromosome"],
        pos="Start_Position",
        start="__bed_start",
        end="__bed_end",
        bin_size=bin_size,
        pad=pad,
    )


MERGECHECK_KEY = (
    "Chromosome", "Start_Position", "HGVSp_Short",
    "Reference_Allele", "Tumor_Seq_Allele2", "Tumor_Sample_Barcode",
)


def _mergecheck_key() -> F.Column:
    # Variant identity = Chromosome+Start_Position+HGVSp_Short+
    # Reference_Allele+Tumor_Seq_Allele2+Tumor_Sample_Barcode (reference
    # genie/database_to_staging.py:688-723); null HGVSp_Short compares
    # as "" (R/mergecheck_functions.R:30-45 pastes with NA→"").
    return F.concat_ws(
        "\x01",
        *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in MERGECHECK_KEY],
    )


def update_mergecheck_flags(
    existing: DataFrame,
    detected: DataFrame,
    keep_centers: list[str] = (),
    flag_centers: list[str] = (),
) -> DataFrame:
    """Mutation-in-cis flag-table transitions (reference
    R/mergecheck_functions.R:19-77 ``uploadToTable``), as one MERGE:

    * existing rows from FLAG-mode centers → ``FLAG``;
    * existing ``TOSS`` rows whose variant key is absent from the
      current detections → ``FIXED`` (the merged variant was repaired);
    * existing rows from OFF(keep)-mode centers → ``KEEP`` (final
      override, same precedence as the reference's statement order);
    * newly detected keys are appended as ``TOSS`` (default) /
      ``KEEP`` / ``FLAG`` by center mode.

    Both inputs need the MERGECHECK_KEY columns plus ``Center``;
    ``existing`` additionally carries ``Flag``.
    """
    key = _mergecheck_key()
    det_keys = detected.select(key.alias("__k")).distinct()
    ex = existing.withColumn("__k", key).join(
        det_keys.withColumn("__in_new", F.lit(True)), "__k", "left"
    )
    in_new = F.coalesce(F.col("__in_new"), F.lit(False))
    flag = F.col("Flag")
    flag = F.when(F.col("Center").isin(list(flag_centers)), "FLAG").otherwise(flag)
    flag = F.when((flag == "TOSS") & ~in_new, "FIXED").otherwise(flag)
    flag = F.when(F.col("Center").isin(list(keep_centers)), "KEEP").otherwise(flag)
    updated = ex.withColumn("Flag", flag).drop("__k", "__in_new")

    new_rows = (
        detected.dropDuplicates(list(MERGECHECK_KEY))
        .withColumn("__k", key)
        .join(existing.select(key.alias("__k")).distinct(), "__k", "left_anti")
        .drop("__k")
        .withColumn(
            "Flag",
            F.when(F.col("Center").isin(list(keep_centers)), "KEEP")
            .when(F.col("Center").isin(list(flag_centers)), "FLAG")
            .otherwise("TOSS"),
        )
    )
    return updated.unionByName(new_rows.select(*updated.columns))


def mutation_in_cis_samples(maf: DataFrame) -> DataFrame:
    """Samples carrying flagged adjacent-variant pairs (W1, reference
    mergeCheck R subprocess, genie/database_to_staging.py:591-761).
    Returns distinct detected sample ids — by reference default a new
    detection is inserted as ``TOSS`` (R/mergecheck_functions.R:19-77)
    and TOSS samples are removed from the release entirely
    (get_mutation_in_cis_filtered_samples, lines 667-685)."""
    flagged = flag_variants_to_merge(maf)
    return flagged.select("Tumor_Sample_Barcode").distinct()


def mergecheck_toss_and_flag(
    mergecheck_flags: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """Split a persisted mergecheck flag table into (toss_sample_ids,
    flagged_variant_keys), mirroring the reference's two queries
    (genie/database_to_staging.py:667-723): ``Flag = 'TOSS'`` →
    samples removed from the release; ``Flag = 'Flag'`` → variants
    tagged ``mutationInCis_Flag`` in the release MAF.  A table without
    a ``Flag`` column (a raw mutationsInCis upload) treats every row as
    TOSS, the reference's insert default."""
    if "Flag" not in mergecheck_flags.columns:
        mergecheck_flags = mergecheck_flags.withColumn("Flag", F.lit("TOSS"))
    flag = F.upper(F.coalesce(F.col("Flag"), F.lit("")))
    toss = (
        mergecheck_flags.where(
            (flag == "TOSS") & F.col("Tumor_Sample_Barcode").isNotNull()
        )
        .select("Tumor_Sample_Barcode")
        .distinct()
    )
    keys = [c for c in MERGECHECK_KEY if c in mergecheck_flags.columns]
    flagged = (
        mergecheck_flags.where(
            (flag == "FLAG") & F.col("Tumor_Sample_Barcode").isNotNull()
        )
        .select(*keys)
        .distinct()
    )
    return toss, flagged


def seq_date_filter_ids(
    clinical: DataFrame,
    processing_date: str,
    cutoff_days: int = 184,
    seq_date_col: str = "SEQ_DATE",
    sample_col: str = "SAMPLE_ID",
) -> DataFrame:
    """Sample ids sequenced within ``cutoff_days`` of the processing
    date — the reference's ``seqDateFilter``
    (genie/process_functions.py:327-353): those samples stay in the
    staging release and are REMOVED from the consortium release (the
    184-day default; bin/database_to_staging.py:410-415).  ``SEQ_DATE``
    is ``%b-%Y`` (``Jan-2017``); the sentinel ``Release`` counts as
    Jan-1900 (always old enough), and unparseable dates are kept.
    """
    from genie_spark.functions.scalars import parse_month_year

    sd = F.when(F.col(seq_date_col) == "Release", F.lit("Jan-1900")).otherwise(
        F.col(seq_date_col)
    )
    recent = F.datediff(
        parse_month_year(F.lit(processing_date)), parse_month_year(sd)
    ) <= F.lit(cutoff_days)
    return (
        clinical.where(F.coalesce(recent, F.lit(False)))
        .select(sample_col)
        .distinct()
    )


def no_genepanel_filter(
    clinical: DataFrame, bed: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Remove samples whose SEQ_ASSAY_ID has no BED file (P13,
    genie/database_to_staging.py:786-805).  Returns (kept, removed)."""
    assays = bed.select("SEQ_ASSAY_ID").distinct()
    kept = clinical.join(assays, "SEQ_ASSAY_ID", "left_semi")
    removed = clinical.join(assays, "SEQ_ASSAY_ID", "left_anti")
    return kept, removed


def configure_maf(
    maf: DataFrame,
    remove_variants_keys: DataFrame | None = None,
    flagged_variant_keys: DataFrame | None = None,
    whitelist: DataFrame | None = None,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Release-time MAF configuration (reference ``configure_maf``
    genie/database_to_staging.py:296-403): drop annotation failures,
    drop germline-frequency variants unless whitelisted, remove
    MAFinBED variants, fill depth=ref+alt algebra, and tag
    mutation-in-cis *variants* (the reference flags per variant key,
    lines 316-339, not per sample).

    ``common_variant`` FILTER rows are deliberately KEPT — the
    reference comments that filter out at the consortium stage (lines
    341-345) and only applies it at consortium→public conversion
    (genie/consortium_to_public.py:27-37); see
    :func:`genie_spark.release.pipeline.consortium_to_public`.

    ``whitelist`` is a BED-shaped DataFrame of known-somatic sites
    (Chromosome/Start_Position_wl/End_Position_wl); variants contained
    in it survive the germline filter (lines 253-292).
    """
    from genie_spark.operators.aggregations import fill_count_algebra

    out = annotation_success_filter(maf)
    wl_hits = whitelist_hits(maf, whitelist) if whitelist is not None else None
    out = germline_filter(out, whitelist_hits=wl_hits)
    if remove_variants_keys is not None:
        keys = key_cols or ["Chromosome", "Start_Position", "Tumor_Sample_Barcode"]
        out = out.join(remove_variants_keys.select(*keys).distinct(), keys, "left_anti")
    for trio in (("t_depth", "t_ref_count", "t_alt_count"),
                 ("n_depth", "n_ref_count", "n_alt_count")):
        if all(c in out.columns for c in trio):
            for c in trio:
                out = out.withColumn(c, F.col(c).try_cast("double"))
            out = fill_count_algebra(out, *trio)
    if flagged_variant_keys is not None:
        # Null-safe textual key (nulls compare as "", like the
        # reference's string concat) over the key columns both sides carry.
        keys = [
            c for c in MERGECHECK_KEY
            if c in flagged_variant_keys.columns and c in out.columns
        ]
        key = F.concat_ws(
            "\x01", *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in keys]
        )
        marks = (
            flagged_variant_keys.select(key.alias("__k"))
            .distinct()
            .withColumn("__flag", F.lit(True))
        )
        out = (
            out.withColumn("__k", key)
            .join(F.broadcast(marks), "__k", "left")
            .withColumn("mutationInCis_Flag", F.coalesce(F.col("__flag"), F.lit(False)))
            .drop("__flag", "__k")
        )
    else:
        out = out.withColumn("mutationInCis_Flag", F.lit(False))
    return out
