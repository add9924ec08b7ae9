"""URL extraction and domain-blocklist filtering over a text column — the
CCNet/RefinedWeb-style URL-level curation ops (extract links, flag or drop
documents citing blocklisted domains). No reference analog (NannyML has no
text ops); the check shape follows the data-quality rate-per-chunk contract.

Pure codegen: ``regexp_extract_all`` for extraction, higher-order
``filter``/``transform`` for per-URL host mapping and blocklist matching —
no UDFs, no shuffle. Pattern dialect follows the same Java↔RE2-identical
contract as text/pii.py (no lookaround/backrefs) so the DuckDB oracle can
replicate byte-for-byte.

At 10^12 rows the blocklist itself is the only non-row-local input: it is
embedded as a literal expression when small (the common case — curated
blocklists are thousands of entries) and should be pushed through a
broadcast join on ``host`` when it outgrows expression size; both ends of
that contract are row-local with respect to the corpus (zero corpus shuffle).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# scheme + optional userinfo@ + host[:port][/path]; path stops at whitespace.
# The host must START and END on an alphanumeric so sentence-final
# punctuation ('visit https://bad-site.org. next') is not swallowed into the
# host — a trailing dot would defeat the blocklist suffix match. Userinfo is
# consumed explicitly so 'http://x@bad-site.org/p' resolves host to the
# domain, not 'x'. RE2/Java identical (no lookaround/backrefs).
URL_PATTERN = (
    r"(https?://(?:[^\s/@]+@)?[A-Za-z0-9](?:[A-Za-z0-9.-]*[A-Za-z0-9])?"
    r"(?::\d{1,5})?(?:/[^\s]*)?)"
)
HOST_PATTERN = r"https?://(?:[^\s/@]+@)?([A-Za-z0-9](?:[A-Za-z0-9.-]*[A-Za-z0-9])?)"


def with_urls(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add ``urls`` (array<string>), ``hosts`` (lowercased array<string>)
    and ``n_urls``. Narrow — one regex pass per row."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    urls = F.regexp_extract_all(t, F.lit(URL_PATTERN), F.lit(1))
    hosts = F.transform(urls, lambda u: F.lower(F.regexp_extract(u, HOST_PATTERN, 1)))
    return (
        df.withColumn("urls", urls)
        .withColumn("hosts", hosts)
        .withColumn("n_urls", F.size(urls).cast("int"))
    )


def domain_match(host: Column, domains: Sequence[str]) -> Column:
    """True when ``host`` equals a blocklisted domain or is a subdomain of
    one (``host == d`` or ``host`` ends with ``"." + d``)."""
    expr = F.lit(False)
    for d in domains:
        d = d.lower()
        expr = expr | (host == F.lit(d)) | host.endswith(F.lit("." + d))
    return expr


def with_blocklist_flags(
    df: DataFrame,
    domains: Sequence[str],
    text_col: str = "text",
    assume_extracted: bool = False,
) -> DataFrame:
    """Add ``n_blocked_urls`` and ``is_blocked`` per document. Always
    re-extracts from ``text_col`` (``with_urls`` replaces any same-named
    columns) unless the caller explicitly vouches for an existing
    ``hosts`` column with ``assume_extracted=True`` — a crawl table that
    happens to ship a metadata column named ``hosts`` must not silently
    short-circuit the scan of the configured text column."""
    out = df if (assume_extracted and "hosts" in df.columns) else with_urls(df, text_col)
    blocked = F.filter(F.col("hosts"), lambda h: domain_match(h, domains))
    return out.withColumn("n_blocked_urls", F.size(blocked).cast("int")).withColumn(
        "is_blocked", F.size(blocked) > 0
    )


def blocklist_filter(
    df: DataFrame,
    domains: Sequence[str],
    text_col: str = "text",
    keep_columns: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Drop documents citing any blocklisted domain (the curation path);
    a pure narrow filter. ``keep_columns`` restores the input projection."""
    flagged = with_blocklist_flags(df, domains, text_col)
    out = flagged.filter(~F.col("is_blocked"))
    return out.select(*(keep_columns or df.columns))


class UrlBlocklistCheck:
    """Runner-compatible check: per-chunk rate of documents citing a
    blocklisted domain plus the mean URL count — one row per (chunk, method)
    with methods ``blocked_doc_rate`` and ``urls_per_doc``. Default
    ``ConstantThreshold(upper=0)`` on the blocked rate: any blocked doc
    alerts. Fit is a no-op (the blocklist is configuration). Fusable: both
    statistics are plain expressions over row-local flags."""

    def __init__(
        self,
        domains: Sequence[str],
        text_col: str = "text",
        id_col: Optional[str] = "doc_id",
        chunker=None,
        upper_threshold: float = 0.0,
    ):
        from spark_validate.chunking import DefaultChunker

        self.domains = [d.lower() for d in domains]
        self.text_col = text_col
        self.id_col = id_col
        self.chunker = chunker or DefaultChunker()
        self.upper_threshold = upper_threshold

    def fit(self, reference: DataFrame) -> "UrlBlocklistCheck":
        return self

    def _cols(self):
        t = F.coalesce(F.col(self.text_col), F.lit(""))
        urls = F.regexp_extract_all(t, F.lit(URL_PATTERN), F.lit(1))
        hosts = F.transform(urls, lambda u: F.lower(F.regexp_extract(u, HOST_PATTERN, 1)))
        blocked = F.filter(hosts, lambda h: domain_match(h, self.domains))
        return urls, blocked

    def _aggs(self, prefix: str = ""):
        urls, blocked = self._cols()
        return [
            F.count(F.lit(1)).alias(f"{prefix}__rows"),
            F.sum((F.size(blocked) > 0).cast("int")).cast("double").alias(f"{prefix}url__blocked"),
            F.sum(F.size(urls)).cast("double").alias(f"{prefix}url__nurls"),
        ]

    def _long(self, wide: DataFrame, extra_cols, prefix: str = "") -> DataFrame:
        from spark_validate.chunking import CHUNK_KEY

        rows = F.col(f"{prefix}__rows")
        pairs = [
            F.struct(
                F.lit(self.text_col).alias("column_name"),
                F.lit("blocked_doc_rate").alias("method"),
                (F.col(f"{prefix}url__blocked") / rows).cast("double").alias("value"),
            ),
            F.struct(
                F.lit(self.text_col).alias("column_name"),
                F.lit("urls_per_doc").alias("method"),
                (F.col(f"{prefix}url__nurls") / rows).cast("double").alias("value"),
            ),
        ]
        return wide.select(CHUNK_KEY, *extra_cols, F.explode(F.array(*pairs)).alias("kv")).select(
            CHUNK_KEY, *extra_cols, "kv.column_name", "kv.method", "kv.value"
        )

    def calculate(self, df: DataFrame, period: str = "analysis") -> DataFrame:
        from spark_validate.calculators.base import assign_chunks
        from spark_validate.checks.constraints import _attach_const_threshold
        from spark_validate.chunking import CHUNK_KEY

        assigned, headers = assign_chunks(df, self.chunker)
        wide = assigned.groupBy(CHUNK_KEY).agg(*self._aggs())
        long_df = self._long(wide, ())
        out = _attach_const_threshold(long_df, headers, period, None, self.upper_threshold)
        return self._strip_informational(out)

    def fuse_contrib(self, dtypes, prefix: str):
        from spark_validate.checks.constraints import _FUSE_HDR_COLS, _attach_const_threshold

        exprs = self._aggs(prefix)

        def fin(wide: DataFrame, period: str) -> DataFrame:
            out = _attach_const_threshold(
                self._long(wide, _FUSE_HDR_COLS, prefix), None, period, None, self.upper_threshold
            )
            return self._strip_informational(out)

        return exprs, fin

    @staticmethod
    def _strip_informational(out: DataFrame) -> DataFrame:
        from spark_validate.calculators.base import strip_informational

        # only the blocked rate alerts; urls_per_doc is informational
        return strip_informational(out, "blocked_doc_rate")

    def get_state(self) -> dict:
        return {"domains": self.domains}

    def set_state(self, state: dict) -> "UrlBlocklistCheck":
        self.domains = list(state["domains"])
        return self

    def violations(self, df: DataFrame, row_id: Optional[str] = None) -> DataFrame:
        from spark_validate.chunking import CHUNK_KEY

        rid = row_id or self.id_col
        assigned = self.chunker.assign(df)
        _, blocked = self._cols()
        return assigned.withColumn("__blocked", blocked).filter(F.size("__blocked") > 0).select(
            F.lit("url_blocklist").alias("check"),
            F.lit(self.text_col).alias("column_name"),
            F.col(CHUNK_KEY),
            (F.col(rid).cast("string") if rid else F.lit(None).cast("string")).alias("row_id"),
            F.lit("blocked_domain").alias("violation_kind"),
            F.array_join(F.col("__blocked"), " ").alias("observed_value"),
        )
