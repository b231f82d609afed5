"""CLI smoke tests — run main() in-process (getOrCreate reuses the session
fixture's JVM, so these are cheap)."""

from __future__ import annotations

from reconciliation_hive_data_spark.__main__ import main


def test_cli_list(spark, capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "recon_order_totals" in out
    assert "x_dedup_near" in out


def test_cli_run(spark, sf_dir, capsys):
    assert main(["run", "agg_count", "--sf-dir", sf_dir, "--show", "5"]) == 0
    assert "MATCH" not in capsys.readouterr().err


def test_cli_run_unknown(spark, capsys):
    assert main(["run", "definitely_not_a_query"]) == 2


def test_cli_recon_clean_and_faulty(spark, sf_dir, capsys):
    src = f"{sf_dir}/orders.parquet"
    args = [
        "recon",
        "--source", src,
        "--target", src,
        "--keys", "o_orderkey",
        "--compare", "o_totalprice:double,o_orderstatus:string",
    ]
    assert main(args) == 0  # identical sides → all MATCH → exit 0
    out = capsys.readouterr().out
    assert out.count("MATCH") >= 6

    # key_diff check on an obviously different pair exits 0 (report mode)
    args_diff = [
        "recon",
        "--source", src,
        "--target", "/root/testdata/sf0.01/orders.parquet",
        "--keys", "o_orderkey",
        "--compare", "o_totalprice:double",
        "--check", "key_diff",
    ]
    assert main(args_diff) == 0
