"""Unit tests: JSON-Schema→StructType converter (Q2), schema-selection
precedence (Q1/Q3), and spark-submit CLI config validation (V1)."""

import pytest

from pyspark.sql import types as T

from extract_kit_spark.schemas import (FIELDS_STRUCT, TABLES_FIELDS,
                                       json_schema_to_struct,
                                       select_profile)
from extract_kit_spark.run import parse_args


def test_json_schema_scalars_and_nullable_union():
    s = json_schema_to_struct({
        "type": "object",
        "properties": {
            "name": {"type": ["string", "null"]},
            "amount": {"type": "number"},
            "count": {"type": "integer"},
            "flag": {"type": "boolean"},
        }})
    assert isinstance(s, T.StructType)
    by_name = {f.name: f.dataType for f in s.fields}
    assert by_name["name"] == T.StringType()
    assert by_name["amount"] == T.DoubleType()
    assert by_name["count"] == T.LongType()
    assert by_name["flag"] == T.BooleanType()


def test_json_schema_nested_and_arrays():
    s = json_schema_to_struct({
        "type": "object",
        "properties": {
            "items": {"type": "array", "items": {
                "type": "object",
                "properties": {"qty": {"type": "number"}}}},
        }})
    items = {f.name: f.dataType for f in s.fields}["items"]
    assert isinstance(items, T.ArrayType)
    assert isinstance(items.elementType, T.StructType)


def test_json_schema_record_and_any_fallback():
    rec = json_schema_to_struct({
        "type": "object",
        "additionalProperties": {"type": "number"}})
    assert rec == T.MapType(T.StringType(), T.DoubleType())
    assert json_schema_to_struct({}) == T.StringType()  # z.any()
    assert json_schema_to_struct(
        {"type": ["string", "number"]}) == T.StringType()  # union


def test_select_profile_precedence():
    custom = T.StructType([T.StructField("x", T.StringType())])
    assert select_profile(custom_schema=custom) == ("custom", custom)
    assert select_profile(tables_only=True) == ("tables", TABLES_FIELDS)
    assert select_profile(document_type="invoice") == \
        ("invoice", FIELDS_STRUCT)
    name, dt = select_profile(query='{"type": "object", "properties":'
                                    ' {"a": {"type": "string"}}}')
    assert name == "custom" and isinstance(dt, T.StructType)
    assert select_profile(query="*") == ("auto", FIELDS_STRUCT)
    assert select_profile() == ("auto", FIELDS_STRUCT)


def test_cli_validation():
    ok = parse_args(["--input", "/x", "--output", "/y"])
    assert ok.profile == "auto" and ok.commit_group_size == 8
    with pytest.raises(SystemExit):
        parse_args(["--input", "/x", "--output", "/y",
                    "--commit-group-size", "0"])
    with pytest.raises(SystemExit):
        parse_args(["--input", "/x", "--output", "/y",
                    "--profile", "nonsense"])
    with pytest.raises(SystemExit):
        parse_args(["--input", "/x", "--output", "/y",
                    "--target-partition-bytes", "10"])


def test_cli_empty_input_dir_friendly_error(tmp_path):
    from extract_kit_spark.run import main
    empty = tmp_path / "noparquet"
    empty.mkdir()
    rc = main(["--input", str(empty), "--output", str(tmp_path / "o")])
    assert rc == 2


def test_cli_crawl_plan_validation(tmp_path, capsys):
    """--crawl-plan without --robots/--sitemaps (or with missing
    paths) exits 2 with a one-line error, like every other input
    check."""
    from extract_kit_spark.fixtures import write_pages_parquet
    from extract_kit_spark.run import main
    pages = tmp_path / "pages.parquet"
    write_pages_parquet(str(pages), 5)
    rc = main(["--crawl-plan", "--input", str(pages),
               "--output", str(tmp_path / "o")])
    assert rc == 2
    assert "--robots" in capsys.readouterr().err
    rc = main(["--crawl-plan", "--input", str(pages),
               "--robots", str(tmp_path / "nope.parquet"),
               "--sitemaps", str(tmp_path / "nope2.parquet"),
               "--output", str(tmp_path / "o")])
    assert rc == 2


def test_cli_crawl_plan_end_to_end(tmp_path, capsys):
    """--crawl-plan writes a schedule whose per-domain offsets step by
    the domain's Crawl-delay and whose reasons split new/stale."""
    import json as _json

    import duckdb

    from extract_kit_spark.fixtures import (write_pages_parquet,
                                            write_robots_parquet,
                                            write_sitemaps_parquet)
    from extract_kit_spark.run import main
    pages = tmp_path / "pages.parquet"
    write_pages_parquet(str(pages), 120)
    robots = tmp_path / "robots.parquet"
    write_robots_parquet(str(robots))
    sitemaps = tmp_path / "sitemaps.parquet"
    write_sitemaps_parquet(str(sitemaps), 120)
    rc = main(["--crawl-plan", "--input", str(pages),
               "--robots", str(robots), "--sitemaps", str(sitemaps),
               "--output", str(tmp_path / "o"),
               "--master", "local[4]"])
    assert rc == 0
    summary = _json.loads(
        capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["n_urls"] == summary["n_new"] + summary["n_stale"]
    # 2 novel urls per domain = 100, MINUS the ones the robots gate
    # legitimately blocks (slugs starting with a disallowed word)
    assert 50 <= summary["n_new"] < 2 * 50
    rows = duckdb.sql(
        f"SELECT domain, seq, delay_s, fetch_offset_s FROM "
        f"read_parquet('{tmp_path}/o/crawl_plan/*.parquet') "
        f"ORDER BY domain, seq").fetchall()
    for d, seq, delay, off in rows:
        assert off == seq * delay, (d, seq)


def test_cli_inprocess_leaves_shared_session_alive(spark, tmp_path):
    """Driving main() in-process must not stop a SparkSession it did
    not create (run._cli_spark ownership): getOrCreate() hands back
    the caller's session, and stopping it kills every later query in
    the calling process — the exact failure mode that broke streaming
    tests downstream of the crawl-plan CLI tests."""
    from extract_kit_spark.fixtures import write_pages_dir
    from extract_kit_spark.run import main
    write_pages_dir(str(tmp_path / "pages"), 20, n_files=1)
    rc = main(["--input", str(tmp_path / "pages"),
               "--output", str(tmp_path / "o"), "--n-groups", "1"])
    assert rc == 0
    # the shared fixture session must still be fully operational
    assert spark.range(3).count() == 3
    assert spark.sparkContext._jsc is not None


def test_cli_manifest_mode(spark, tmp_path):
    """--manifest writes the mixture-manifest table for an existing
    extraction output: shares sum to 1, doc totals equal the ok rows,
    and a data-less --output fails with the friendly exit 2."""
    import json as _json

    import duckdb

    from extract_kit_spark.fixtures import write_pages_dir
    from extract_kit_spark.run import main

    rc = main(["--manifest", "--output", str(tmp_path / "nope")])
    assert rc == 2
    write_pages_dir(str(tmp_path / "pages"), 40, n_files=1)
    assert main(["--input", str(tmp_path / "pages"),
                 "--output", str(tmp_path / "o"),
                 "--n-groups", "1"]) == 0
    rc = main(["--manifest", "--output", str(tmp_path / "o")],)
    assert rc == 0
    got = duckdb.sql(
        f"SELECT sum(n_docs) AS d, sum(token_share) AS s FROM "
        f"read_parquet('{tmp_path}/o/manifest/*.parquet')").fetchone()
    n_ok = duckdb.sql(
        f"SELECT count(*) FROM read_parquet("
        f"'{tmp_path}/o/data/*/*.parquet') "
        f"WHERE status = 'ok'").fetchone()[0]
    assert int(got[0]) == n_ok
    assert abs(got[1] - 1.0) < 1e-9


def test_cli_curate_route_flags():
    """--strip-dup-spans / --near-dup-route parse and validate."""
    import pytest
    ok = parse_args(["--curate", "--output", "/y",
                     "--strip-dup-spans",
                     "--near-dup-route", "embedding"])
    assert ok.strip_dup_spans and ok.near_dup_route == "embedding"
    assert parse_args(["--curate", "--output", "/y"]) \
        .near_dup_route == "jaccard"
    with pytest.raises(SystemExit):
        parse_args(["--curate", "--output", "/y",
                    "--near-dup-route", "bogus"])
