"""HGVS string handling as Column expressions.

Mirrors reference parsing of genomic (g.) SNV strings and transcript (c.)
strings (src/P6/genotype.py:67-91,236-270) plus the intra-row
HGVS-vs-raw-coordinate consistency predicate (src/P6/mapper.py:444-500).
All pure column logic — no joins, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ``chr16:g.16177614C>T`` / ``16:g.100A>G`` — the reference ships TWO g.
# patterns and they differ in the chromosome class:
#   - normalization (src/P6/genotype.py:66-76 _HGVS_G_SNV): [0-9XYM]+
#     (no T — "MT" does not normalize in the reference either)
#   - consistency check (src/P6/mapper.py:566-570): [^:]+ (any non-colon
#     run, so "foo:g.100A>G" parses and gets compared)
_G_SNV = r"^(?:[Cc][Hh][Rr])?([0-9XYMxym]+):[gG]\.(\d+)([ACGTacgt]+)>([ACGTacgt]+)$"
_G_CHECK = r"^(?:[Cc][Hh][Rr])?([^:]+):[gG]\.(\d+)([ACGTacgt]+)>([ACGTacgt]+)$"
# ``NM_000000.0:c.100A>G`` / ``ENST00000205557.12:c.2428G>A``
_C_SPLIT = r"^([A-Za-z_0-9]+(?:\.\d+)?):([cC]\..+)$"


def hgvs_g_parts(col: Column, pattern: str = _G_SNV) -> dict[str, Column]:
    s = F.trim(col.cast("string"))
    return {
        "chrom": F.regexp_extract(s, pattern, 1),
        "pos": F.regexp_extract(s, pattern, 2).try_cast("long"),
        "ref": F.upper(F.regexp_extract(s, pattern, 3)),
        "alt": F.upper(F.regexp_extract(s, pattern, 4)),
    }


def hgvs_g_is_malformed(col: Column) -> Column:
    """True when the g. string fails the reference's consistency-check
    pattern — the case where check_hgvs_consistency emits an ERROR
    'malformed HGVS g. notation' and returns early
    (src/P6/mapper.py:561-575). This fires for every non-SNV variant
    (del/dup/ins) and for missing cells: pandas hands the reference
    ``str(nan)`` == 'nan', which does not parse."""
    s = F.coalesce(F.trim(col.cast("string")), F.lit("nan"))
    return ~s.rlike(_G_CHECK)


def hgvs_g_normalize(col: Column) -> Column:
    """Normalize a g. SNV: strip ``chr``, uppercase alleles →
    ``16:g.100A>G`` (reference src/P6/genotype.py:252-270). Non-SNV
    strings just lose a leading ``chr``."""
    p = hgvs_g_parts(col)
    s = F.trim(col.cast("string"))
    return F.when(
        p["chrom"] != "",
        F.concat(p["chrom"], F.lit(":g."), p["pos"].cast("string"), p["ref"], F.lit(">"), p["alt"]),
    ).otherwise(F.regexp_replace(s, r"^[Cc][Hh][Rr]", ""))


def hgvs_c_parts(col: Column) -> tuple[Column, Column]:
    """(transcript, c-part) split (reference src/P6/genotype.py:80-91)."""
    s = F.trim(col.cast("string"))
    t = F.regexp_extract(s, _C_SPLIT, 1)
    c = F.regexp_extract(s, _C_SPLIT, 2)
    null = F.lit(None).cast("string")
    return (F.when(t == "", null).otherwise(t), F.when(c == "", null).otherwise(c))


def hgvs_raw_consistent(
    hgvsg: Column,
    chromosome: Column,
    start_position: Column,
    end_position: Column,
    reference: Column,
    alternate: Column,
) -> Column:
    """Theta-predicate: does the g. string agree with raw coordinates?
    (reference src/P6/mapper.py:444-500, J3 in SURVEY §2.5)

    chromosome equal chr-insensitively; positions either 1-based
    (start==pos and end==pos) or BED-like (start==pos-1 and end==pos);
    ref/alt equal case-insensitively. Uses the reference's permissive
    check pattern ([^:]+ chromosome). Unparseable g. strings are
    vacuously consistent HERE — the reference emits a separate
    'malformed HGVS g. notation' ERROR for them and never reaches the
    mismatch comparison; callers pair this predicate with
    hgvs_g_is_malformed for that audit channel.
    """
    p = hgvs_g_parts(hgvsg, pattern=_G_CHECK)
    raw_chrom = F.lower(F.regexp_replace(F.trim(chromosome.cast("string")), r"^[Cc][Hh][Rr]", ""))
    g_chrom = F.lower(p["chrom"])
    st = start_position.try_cast("long")
    en = end_position.try_cast("long")
    pos_ok = ((st == p["pos"]) & (en == p["pos"])) | ((st == p["pos"] - 1) & (en == p["pos"]))
    alleles_ok = (F.upper(F.trim(reference.cast("string"))) == p["ref"]) & (
        F.upper(F.trim(alternate.cast("string"))) == p["alt"]
    )
    comparable = p["chrom"] != ""
    return F.when(comparable, (g_chrom == raw_chrom) & pos_ok & alleles_ok).otherwise(F.lit(True))
