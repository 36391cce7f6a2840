from genie_spark.release.filters import (
    common_variant_filter,
    configure_maf,
    germline_filter,
    mafinbed_remove_variants,
    mutation_in_cis_samples,
    no_genepanel_filter,
)
from genie_spark.release.pipeline import run_release

__all__ = [
    "common_variant_filter",
    "configure_maf",
    "germline_filter",
    "mafinbed_remove_variants",
    "mutation_in_cis_samples",
    "no_genepanel_filter",
    "run_release",
]
