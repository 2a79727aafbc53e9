"""CLI — reference ``__main__.py:8-69`` re-expressed for spark-submit.

Run either way (north_rule: ``spark-submit --py-files``):

    python -m ontology_mapper_spark -s terms.txt -t onto.owl -o out.csv
    spark-submit --py-files ontology_mapper_spark.zip -m ontology_mapper_spark ...

Differences from the reference CLI, all deliberate:
- ``-t`` takes a local OWL file or a cached acronym (no network download).
- zooma/bioportal require ``--api-transport module:callable`` (the offline
  engine ships no HTTP client; see ``operators/api_mappers.py``).
- min_score default mirrors the reference CLI's 0.5 (API default is 0.3 —
  the reference has the same split, ``__main__.py:30-31`` vs ``t2t.py:33``).
"""

from __future__ import annotations

import argparse
import sys


def resolve_transport(spec: str):
    """'module:callable' -> the transport callable (for zooma/bioportal);
    '' -> None. The module must be importable on driver and executors
    (ship it via --py-files)."""
    if not spec:
        return None
    import importlib

    mod_name, _, attr = spec.partition(":")
    if not attr:
        raise SystemExit(
            f"--api-transport must be 'module:callable', got: {spec!r}"
        )
    return getattr(importlib.import_module(mod_name), attr)


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="ontology_mapper_spark")
    parser.add_argument("-s", "--source", required=True,
                        help="input file: one term per line, or CSV/TSV with -csv")
    parser.add_argument("-t", "--target", required=True,
                        help="target ontology: OWL file path or cached acronym")
    parser.add_argument("-o", "--output", default="",
                        help="output CSV path (default: t2t-mappings-<ts>.csv)")
    parser.add_argument("-m", "--mapper", default="tfidf",
                        choices=["levenshtein", "jaro", "jarowinkler", "jaccard",
                                 "fuzzy", "tfidf", "indel", "zooma", "bioportal"])
    parser.add_argument("-bp", "--bioportal_apikey", default="",
                        help="BioPortal API key (reference -bp)")
    parser.add_argument("--api-transport", default="", dest="api_transport",
                        help="'module:callable' import path of the HTTP "
                             "transport for zooma/bioportal (this offline "
                             "engine ships none; see operators/api_mappers.py)")
    parser.add_argument("-csv", "--csv_input", default="",
                        help="term column name[,id column name] for CSV input")
    parser.add_argument("-sep", "--separator", default=",")
    parser.add_argument("-top", "--top_mappings", type=int, default=3)
    parser.add_argument("-min", "--min_score", type=float, default=0.5)
    parser.add_argument("-iris", "--base_iris", default="",
                        help="comma-separated IRI prefixes")
    parser.add_argument("-d", "--excl_deprecated", action="store_true")
    parser.add_argument("-g", "--save_term_graphs", action="store_true")
    parser.add_argument("-c", "--store_in_cache", default="",
                        help="acronym: cache the ontology then map via cache")
    parser.add_argument("-type", "--term_type", default="class",
                        choices=["class", "property", "any"])
    parser.add_argument("-u", "--incl_unmapped", action="store_true")
    parser.add_argument("--cores", type=int, default=None)
    args = parser.parse_args(argv)

    from ontology_mapper_spark.config import MappingConfig
    from ontology_mapper_spark.pipeline import map_terms_df
    from ontology_mapper_spark.session import get_spark
    from ontology_mapper_spark.sinks import write_mappings_csv
    from ontology_mapper_spark.sources import cache as onto_cache
    from ontology_mapper_spark.sources import terms as term_src
    from ontology_mapper_spark.sources.ontology import onto_terms_from_rows
    from ontology_mapper_spark.sources.owl import parse_owl

    spark = get_spark("ontology-mapper-spark-cli", cores=args.cores)

    if args.csv_input:
        cols = args.csv_input.split(",")
        mentions = term_src.mentions_from_csv(
            spark, args.source, cols[0],
            cols[1] if len(cols) > 1 else "", args.separator,
        )
    else:
        mentions = term_src.mentions_from_file(spark, args.source)

    cfg = MappingConfig(
        base_iris=tuple(i for i in args.base_iris.split(",") if i),
        excl_deprecated=args.excl_deprecated,
        max_mappings=args.top_mappings,
        min_score=args.min_score,
        mapper=args.mapper,
        term_type=args.term_type,
        incl_unmapped=args.incl_unmapped,
        api_transport=resolve_transport(args.api_transport),
        bioportal_apikey=args.bioportal_apikey,
    )
    cfg.validate()  # fail fast (e.g. zooma/bioportal without a transport)

    if args.store_in_cache:
        handle = onto_cache.cache_ontology(spark, args.target, args.store_in_cache)
        onto = handle.terms(cfg.base_iris, cfg.excl_deprecated, cfg.term_type)
    elif onto_cache.cache_exists(args.target):
        onto = onto_cache.OntologyCache(spark, args.target).terms(
            cfg.base_iris, cfg.excl_deprecated, cfg.term_type
        )
    else:
        onto = onto_terms_from_rows(spark, parse_owl(args.target))
        from ontology_mapper_spark.sources.ontology import filter_terms_df

        onto = filter_terms_df(onto, cfg.base_iris, cfg.excl_deprecated,
                               cfg.term_type)

    # filters already applied; avoid re-filtering inside the pipeline
    from ontology_mapper_spark.config import OntologyTermType

    run_cfg = MappingConfig(**{**cfg.__dict__, "base_iris": (),
                               "excl_deprecated": False,
                               "term_type": OntologyTermType.ANY})
    mappings = map_terms_df(mentions, onto, run_cfg)

    output = args.output
    if not output:
        import datetime

        ts = datetime.datetime.now().strftime("%d-%m-%YT%H-%M-%S")
        output = f"t2t-mappings-{ts}.csv"
    n_source = mentions.count()
    write_mappings_csv(mappings, output, cfg, args.target, n_source)
    print(f"wrote {output}")

    if args.save_term_graphs:
        from ontology_mapper_spark.operators.graph import term_graphs_json

        graphs_path = output + "-term-graphs.json"
        from pyspark.sql import functions as F

        docs = term_graphs_json(onto).select(
            F.to_json(F.struct("iri", "nodes", "edges")).alias("j")
        ).collect()
        with open(graphs_path, "w") as f:
            f.write("[" + ",\n".join(r["j"] for r in docs) + "]")
        print(f"wrote {graphs_path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
