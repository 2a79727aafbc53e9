"""Pages source, frozen extractor, mention detection, KG construction,
checkpoint/resume, sinks."""

import hashlib
import os

import pytest
from pyspark.sql import functions as F

from ontology_mapper_spark.checkpoints import CheckpointedRun
from ontology_mapper_spark.config import MappingConfig
from ontology_mapper_spark.pipeline import construct_kg, map_terms_df, mappings_to_triples
from ontology_mapper_spark.sinks import write_mappings_csv
from ontology_mapper_spark.sources.ontology import fixture_onto_terms
from ontology_mapper_spark.sources.pages import (
    detect_mentions,
    extract_text,
    extract_text_py,
    page_rows,
    render_html,
    synthesize_pages,
)


@pytest.fixture(scope="module")
def onto(spark):
    return fixture_onto_terms(spark).cache()


@pytest.fixture(scope="module")
def pages(spark):
    return synthesize_pages(spark, 200).cache()


def test_extractor_frozen():
    html = render_html("T", ["asthma", "food allergy"])
    assert extract_text_py(html) == "T\nasthma\nfood allergy"
    # byte-stable golden hash — the frozen-extractor contract (north_rule)
    h = hashlib.md5(extract_text_py(html).encode()).hexdigest()
    assert h == hashlib.md5(b"T\nasthma\nfood allergy").hexdigest()


@pytest.mark.spark
def test_synthesized_pages_deterministic(spark, pages):
    rows = {r["url"]: r for r in pages.collect()}
    for i, (url, ts, html, text, lang) in enumerate(page_rows(200)):
        r = rows[url]
        assert bytes(r["html"]) == html, url
        assert r["text"] == text, url
        assert r["lang"] == lang
    # text column == frozen extraction of html, byte-identical per url
    re_ex = extract_text(pages.drop("text"))
    diff = (
        re_ex.alias("a")
        .join(pages.alias("b"), "url")
        .filter(F.col("a.text") != F.col("b.text"))
        .count()
    )
    assert diff == 0


@pytest.mark.spark
def test_detect_mentions(spark, pages):
    m = detect_mentions(pages).cache()
    assert m.columns == ["source_term_id", "source_term", "tags", "url", "warc_ts"]
    n_en = pages.filter("lang = 'en'").count()
    assert m.count() == n_en * 4  # 4 paragraphs per page
    # deterministic ids: url#ordinal, unique
    assert m.select("source_term_id").distinct().count() == m.count()
    some = m.filter(F.col("source_term_id").endswith("page0#0")).collect()
    assert len(some) == 1


@pytest.mark.spark
def test_construct_kg_end_to_end(spark, pages, onto):
    triples = construct_kg(pages, onto, MappingConfig(max_mappings=1)).cache()
    rows = triples.collect()
    assert rows
    assert all(r["pred"] == "mappedTo" for r in rows)
    # every asthma mention links to EFO asthma
    asthma = [r for r in rows if r["subj"].endswith("#0")]
    m = detect_mentions(pages).filter("source_term = 'asthma'").collect()
    linked = {r["subj"] for r in rows}
    for mention in m:
        assert mention["source_term_id"] in linked


@pytest.mark.spark
def test_checkpointed_run_resume(spark, pages, onto, tmp_path):
    out1 = str(tmp_path / "full")
    out2 = str(tmp_path / "resumed")
    cfg = MappingConfig(max_mappings=1)

    def build(subset):
        return construct_kg(subset, onto, cfg)

    full = CheckpointedRun(spark, out1, n_buckets=4, input_snapshot="s1")
    res_full = full.run(pages, "url", build).collect()

    # simulate a crash after 2 buckets: run only buckets {0,1} then resume
    partial = CheckpointedRun(spark, out2, n_buckets=4, input_snapshot="s1")
    done_early = []

    def build_crashing(subset):
        if len(done_early) == 2:
            raise RuntimeError("simulated crash")
        done_early.append(1)
        return build(subset)

    with pytest.raises(RuntimeError):
        partial.run(pages, "url", build_crashing)
    assert partial.completed_buckets() == {0, 1}
    resumed = CheckpointedRun(spark, out2, n_buckets=4, input_snapshot="s1")
    res_resumed = resumed.run(pages, "url", build).collect()

    assert sorted(map(tuple, res_full)) == sorted(map(tuple, res_resumed))
    # lineage has one row per bucket
    lin = spark.read.parquet(os.path.join(out2, "_lineage"))
    assert lin.count() == 4
    # score metrics written
    met = spark.read.parquet(os.path.join(out2, "_metrics"))
    assert met.agg(F.sum("n")).collect()[0][0] == len(res_resumed)


@pytest.mark.spark
def test_checkpointed_run_bucketed_pruned_and_global_idf(spark, pages, onto, tmp_path):
    """The executable bucket-pruning contract: pages materialized with
    write_bucketed, each restart unit's scan touches ONLY its bucket=N
    files; with prepare_fn computing the whole-corpus source IDF, bucketed
    output is identical to the unbucketed pipeline (no bucket-local TF-IDF
    drift — round-1 ADVICE #5)."""
    from ontology_mapper_spark.checkpoints import write_bucketed
    from ontology_mapper_spark.operators.tfidf import source_idf_map

    cfg = MappingConfig(max_mappings=1)
    src = str(tmp_path / "pages_bucketed")
    write_bucketed(pages, "url", src, n_buckets=4)

    seen_files: list[list[str]] = []

    def prepare(full_pages):
        mentions = detect_mentions(full_pages).select(
            "source_term_id", "source_term"
        )
        return source_idf_map(mentions)

    def build(subset, state):
        seen_files.append(list(subset.inputFiles()))
        return construct_kg(subset, onto, cfg, tfidf_source_idf=state)

    run = CheckpointedRun(spark, str(tmp_path / "out"), n_buckets=4,
                          input_snapshot="s1")
    got = run.run_bucketed(src, build, prepare_fn=prepare).collect()

    # every per-bucket scan read only its own bucket directory
    assert len(seen_files) == 4
    for b, files in enumerate(seen_files):
        assert files, b
        assert all(f"bucket={b}" in f for f in files), (b, files)

    # bucketed+global-IDF output == plain unbucketed pipeline output
    plain = construct_kg(pages, onto, cfg).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, plain))

    # resume skips completed buckets and never rescans their files
    seen_files.clear()
    resumed = CheckpointedRun(spark, str(tmp_path / "out"), n_buckets=4,
                              input_snapshot="s1")
    again = resumed.run_bucketed(src, build, prepare_fn=prepare).collect()
    assert seen_files == []  # all buckets already complete
    assert sorted(map(tuple, again)) == sorted(map(tuple, plain))


@pytest.mark.spark
def test_csv_sink_format(spark, onto, tmp_path):
    from ontology_mapper_spark.pipeline import map_terms

    cfg = MappingConfig(incl_unmapped=True)
    df = map_terms(spark, ["asthma", "mojito"], onto, cfg)
    path = str(tmp_path / "out.csv")
    write_mappings_csv(df, path, cfg, "fixture-efo-hp", 2)
    with open(path) as f:
        lines = f.read().splitlines()
    assert len([l for l in lines if l.startswith("#")]) == 11
    header = [l for l in lines if l.startswith("Source Term ID")][0]
    assert header.split(",")[:3] == ["Source Term ID", "Source Term",
                                     "Mapped Term Label"]
    assert any("were mapped to" in l for l in lines)


@pytest.mark.spark
def test_construct_full_kg_partitioned(spark, pages, onto, tmp_path):
    """Mapping triples ∪ hierarchy edges in one relation, materialized
    partitioned by pred (predicate-pruned graph-table layout)."""
    from ontology_mapper_spark.pipeline import construct_full_kg

    out = str(tmp_path / "kg")
    kg = construct_full_kg(pages, onto, MappingConfig(max_mappings=1),
                           out_path=out)
    preds = {r["pred"] for r in kg.select("pred").distinct().collect()}
    assert "mappedTo" in preds and "IS_A" in preds and "INSTANCE_OF" in preds
    # partitioned layout on disk; a pred filter prunes to one directory
    assert os.path.isdir(os.path.join(out, "pred=mappedTo"))
    assert os.path.isdir(os.path.join(out, "pred=IS_A"))
    # pred filter becomes a partition filter (pruned scan), and the pruned
    # directory read agrees with the filtered count
    import contextlib
    import io

    only_isa = kg.filter(F.col("pred") == "IS_A")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        only_isa.explain("formatted")
    pf = [ln for ln in buf.getvalue().splitlines() if "PartitionFilters" in ln]
    assert pf and "pred" in pf[0], buf.getvalue()
    direct = spark.read.parquet(os.path.join(out, "pred=IS_A"))
    assert direct.count() == only_isa.count()
    # ontology-side edges carry null score; mapping triples carry one
    assert kg.filter((F.col("pred") != "mappedTo") & F.col("score").isNotNull()
                     ).count() == 0
    assert kg.filter((F.col("pred") == "mappedTo") & F.col("score").isNull()
                     ).count() == 0


# ------------------------------------------------------------------- r4:
# SSSOM export + per-predicate KG summary


@pytest.mark.spark
def test_to_sssom_rows_and_curie_fallback(spark):
    """Resolvable IRIs project to CURIEs; unresolvable fall back to the
    full IRI; unmapped rows (empty IRI) carry no SSSOM row."""
    from ontology_mapper_spark.sinks import to_sssom

    rows = [
        ("t1", "asthma", "Asthma", "HP:x",
         "http://purl.obolibrary.org/obo/HP_0002099", 0.912, None),
        ("t2", "blah", "Thing", "", "http://unknown.example/term/9", 0.5,
         None),
        ("t3", "mojito", "", "", "", 0.0, None),
    ]
    df = spark.createDataFrame(
        rows,
        "source_term_id string, source_term string, mapped_term_label "
        "string, mapped_term_curie string, mapped_term_iri string, "
        "mapping_score double, tags array<string>",
    )
    out = {r["subject_id"]: r for r in to_sssom(df).collect()}
    assert set(out) == {"t1", "t2"}
    assert out["t1"]["object_id"] == "HP:0002099"
    assert out["t1"]["predicate_id"] == "skos:closeMatch"
    assert out["t1"]["mapping_justification"] == "semapv:LexicalMatching"
    assert out["t2"]["object_id"] == "http://unknown.example/term/9"


@pytest.mark.spark
def test_write_sssom_tsv(spark, tmp_path):
    from ontology_mapper_spark.sinks import SSSOM_COLUMNS, write_sssom_tsv

    rows = [
        ("t1", "asthma", "Asthma", "HP:x",
         "http://purl.obolibrary.org/obo/HP_0002099", 0.912, None),
    ]
    df = spark.createDataFrame(
        rows,
        "source_term_id string, source_term string, mapped_term_label "
        "string, mapped_term_curie string, mapped_term_iri string, "
        "mapping_score double, tags array<string>",
    )
    path = str(tmp_path / "m.sssom.tsv")
    write_sssom_tsv(df, path)
    lines = open(path).read().splitlines()
    hdr = [ln for ln in lines if ln.startswith("#")]
    assert any("mapping_set_id" in ln for ln in hdr)
    assert any(ln.strip("# ").startswith("skos:") for ln in hdr)
    assert any(ln.strip("# ").startswith("HP:") for ln in hdr)
    body = [ln for ln in lines if not ln.startswith("#")]
    assert body[0] == "\t".join(SSSOM_COLUMNS)
    assert body[1].split("\t")[3] == "HP:0002099"


@pytest.mark.spark
def test_kg_summary_known_values(spark):
    from ontology_mapper_spark.operators.graph import kg_summary

    rows = [
        ("u1#0", "mappedTo", "E1", 0.9),
        ("u1#1", "mappedTo", "E1", 0.9),
        ("u2#0", "mappedTo", "E2", 0.9),
        ("E1", "IS_A", "E9", None),
    ]
    df = spark.createDataFrame(
        rows, "subj string, pred string, obj string, score double"
    )
    got = {
        r["pred"]: (r["n_triples"], r["n_subjects"], r["n_objects"])
        for r in kg_summary(df).collect()
    }
    assert got == {"mappedTo": (3, 3, 2), "IS_A": (1, 1, 1)}
