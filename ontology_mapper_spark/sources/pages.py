"""Common-Crawl-style page table: synthesis, text extraction, mention
detection (SURVEY.md §1.1, FIXTURES.md §1; D5 in §2).

Input shape per BASELINE.json input_hint:
``pages(url string, warc_ts timestamp, html binary, text string, lang string)``.

- ``synthesize_pages`` builds a deterministic page corpus (seeded, no
  external data) whose paragraphs are drawn from the reference test
  vocabulary so mappings are oracle-checkable.
- ``extract_text`` is the FROZEN extractor: the per-url ``text`` column must
  be byte-identical across runs and engines (north_rule). It is defined once
  here, pure-Python, deterministic, and run as an Arrow-batched pandas UDF.
- ``detect_mentions`` turns pages into the mentions relation: one mention
  per <p> paragraph, id = url + '#' + paragraph ordinal (deterministic).

The synthetic HTML template is intentionally simple; real-world extraction
would swap the body of ``extract_text_py`` while keeping its contract
(bytes -> str, deterministic, no network).
"""

from __future__ import annotations

import datetime
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)

# Reference test vocabulary (test/unstruct_terms.txt, simple_preprocess.txt,
# simple_tests.py) + guaranteed-unmapped strings — FIXTURES.md §1.
MENTION_VOCAB = [
    "asthma",
    "acute bronchitis",
    "colon disease",
    "disease location",
    "food allergy",
    "asthma attack",
    "protein level",
    "allergy",
    "contains",
    "location",
    "carbon monoxide",
    "margarita",
    "mojito",
    "isdjfnsdfwd",
]

_LANGS = ["en"] * 19 + ["de", "fr"]  # ~5% non-en rotation

_TITLE_RE = re.compile(rb"<title>(.*?)</title>", re.S)
_P_RE = re.compile(rb"<p>(.*?)</p>", re.S)
_EPOCH = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)


def render_html(title: str, paragraphs: list[str]) -> bytes:
    body = "\n".join(f"<p>{p}</p>" for p in paragraphs)
    return (
        f"<html><head><title>{title}</title></head>\n"
        f"<body>\n{body}\n</body></html>"
    ).encode("utf-8")


def extract_text_py(html: bytes) -> str:
    """FROZEN extractor: title line + one line per <p>. Deterministic,
    byte-stable (tests hash it per url). Treat as versioned behavior — any
    change is a breaking format bump."""
    title = _TITLE_RE.search(html)
    lines = []
    if title:
        lines.append(title.group(1).decode("utf-8", "replace").strip())
    for m in _P_RE.finditer(html):
        lines.append(m.group(1).decode("utf-8", "replace").strip())
    return "\n".join(lines)


def _paragraphs(i: int, mentions_per_page: int, variants: int) -> list[str]:
    v = len(MENTION_VOCAB)
    paras = []
    for j in range(mentions_per_page):
        base = MENTION_VOCAB[(i * 7 + 3 * j) % v]
        if variants:
            base = f"{base} case {(i * 13 + j * 7) % variants}"
        paras.append(base)
    return paras


def page_rows(
    n_pages: int, mentions_per_page: int = 4, variants: int = 0,
    start: int = 0,
) -> Iterator[tuple]:
    """Deterministic page generator (seed-free arithmetic rotation).
    ``variants`` > 0 appends a rotating qualifier to each mention so bench
    corpora have ~``len(vocab) * variants`` distinct mention strings.
    ``start``: first index to yield — each page is a pure function of its
    index, so a range can be generated without rendering its prefix."""
    for i in range(start, n_pages):
        url = f"https://example.org/site{i % 97}/page{i}"
        ts = _EPOCH + datetime.timedelta(seconds=37 * i)
        paras = _paragraphs(i, mentions_per_page, variants)
        html = render_html(f"Synthetic page {i}", paras)
        yield (url, ts, html, extract_text_py(html), _LANGS[i % len(_LANGS)])


def recrawl_rows(
    lo: int,
    hi: int,
    mutate_every: int = 7,
    extra_paragraph: str = "recurrent asthma episode",
    recrawl_delay_days: int = 30,
) -> Iterator[tuple]:
    """Deterministic later-cycle crawl over pages [lo, hi): indices below
    the previous corpus size are RE-captures whose content changed only
    where ``i % mutate_every == 0`` (one appended paragraph, re-rendered
    through the frozen extractor); the rest are byte-identical
    re-captures at a later warc_ts; indices beyond the previous corpus
    are new urls. One rule, shared by the incremental-KG tests, the
    ``incremental_kg_triples`` gate query, and its DuckDB full-rebuild
    oracle replay."""
    for i, (url, ts, html, text, lang) in zip(
        range(lo, hi), page_rows(hi, start=lo)
    ):
        if i % mutate_every == 0:
            paras = text.split("\n")[1:] + [extra_paragraph]
            html = render_html(f"Synthetic page {i}", paras)
            text = extract_text_py(html)
        yield (
            url,
            ts + datetime.timedelta(days=recrawl_delay_days),
            html,
            text,
            lang,
        )


def recrawl_pages(spark: SparkSession, lo: int, hi: int, **kw) -> DataFrame:
    """``recrawl_rows`` as a DataFrame. Driver-side materialization is fine
    at gate/test scale (hundreds of rows); a bench-scale delta would use
    the ``synthesize_pages`` mapInPandas shape instead."""
    rows = [
        (u, ts.replace(tzinfo=None), h, t, lang)
        for u, ts, h, t, lang in recrawl_rows(lo, hi, **kw)
    ]
    return spark.createDataFrame(rows, PAGES_SCHEMA)


def synthesize_pages(
    spark: SparkSession,
    n_pages: int,
    mentions_per_page: int = 4,
    num_partitions: int | None = None,
    variants: int = 0,
    start: int = 0,
) -> DataFrame:
    """Distributed deterministic synthesis: each partition renders its own
    index range (no driver materialization — scales to any n_pages).
    ``start``: first page index (a [start, n_pages) slice — pages are pure
    functions of their index, so a later crawl cycle's range can be
    synthesized without its prefix)."""
    # Every Arrow/pandas stage pays a fixed per-task cost (~0.1-0.3s for
    # worker handshake + Arrow setup), so partitions must be coarse enough
    # to amortize it (~2500 pages ≈ 10k mentions ≈ one Arrow batch per
    # task) while still giving up to ~64 concurrent tasks for scale-out.
    n_slice = n_pages - start
    num_partitions = num_partitions or max(8, min(256, n_slice // 2500 or 1))
    rng = spark.range(start, n_pages, 1, num_partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                paras = _paragraphs(i, mentions_per_page, variants)
                html = render_html(f"Synthetic page {i}", paras)
                rows.append(
                    (
                        f"https://example.org/site{i % 97}/page{i}",
                        (_EPOCH + datetime.timedelta(seconds=37 * i)).replace(
                            tzinfo=None
                        ),
                        html,
                        extract_text_py(html),
                        _LANGS[i % len(_LANGS)],
                    )
                )
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    return rng.mapInPandas(gen, schema=PAGES_SCHEMA)


def extract_text(pages: DataFrame) -> DataFrame:
    """D5 — recompute ``text`` from ``html`` with the frozen extractor
    (Arrow-batched pandas UDF over the binary column)."""

    @F.pandas_udf(T.StringType())
    def _extract(html: pd.Series) -> pd.Series:
        return html.map(extract_text_py)

    return pages.withColumn("text", _extract(F.col("html")))


def detect_mentions(pages: DataFrame, langs: tuple = ("en",)) -> DataFrame:
    """Vectorized mention detection: text -> one mention per paragraph line
    (line 0 is the title, skipped). Deterministic id = url + '#' + ordinal.
    Pure native expressions — explode + posexplode, no Python."""
    if langs:
        pages = pages.filter(F.col("lang").isin(*langs))
    lines = pages.select(
        "url",
        "warc_ts",
        F.posexplode(F.split(F.col("text"), "\n")).alias("pos", "source_term"),
    ).filter((F.col("pos") > 0) & (F.col("source_term") != ""))
    return lines.select(
        F.concat(F.col("url"), F.lit("#"), (F.col("pos") - 1).cast("string")).alias(
            "source_term_id"
        ),
        "source_term",
        F.lit(None).cast(T.ArrayType(T.StringType())).alias("tags"),
        "url",
        "warc_ts",
    )
