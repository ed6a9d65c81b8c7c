from p6_spark.functions.scalars import (
    GENO_ALLELIC_STATE,
    INHERITANCE_MAP,
    ZYGOSITY_MAP,
    canonical_chromosome,
    email_or_default,
    geno_code_for_zygosity,
    map_lookup,
    normalize_time_like,
    to_bool,
)
from p6_spark.functions.hpo import hpo_curie, hpo_label, parse_hpo_cell
from p6_spark.functions.hgvs import (
    hgvs_c_parts,
    hgvs_g_normalize,
    hgvs_raw_consistent,
)

__all__ = [
    "GENO_ALLELIC_STATE",
    "INHERITANCE_MAP",
    "ZYGOSITY_MAP",
    "canonical_chromosome",
    "email_or_default",
    "geno_code_for_zygosity",
    "map_lookup",
    "normalize_time_like",
    "to_bool",
    "hpo_curie",
    "hpo_label",
    "parse_hpo_cell",
    "hgvs_c_parts",
    "hgvs_g_normalize",
    "hgvs_raw_consistent",
]
