"""CLI surface (K6 console rendering + the ad-hoc SQL surface)."""

from __future__ import annotations

from iotdatapipeline_spark.__main__ import main


class TestCli:
    def test_query_subcommand_prints_table(self, spark, sf_small, capsys):
        rc = main(["query", "latest_snapshot", "--sf-dir", sf_small, "--rows", "5"])
        assert rc == 0
        out = capsys.readouterr().out
        assert "|" in out and "station" in out  # the K6-style console table

    def test_query_subcommand_unknown_name(self, sf_small, capsys):
        rc = main(["query", "no_such_query", "--sf-dir", sf_small])
        assert rc == 2
        assert "unknown query" in capsys.readouterr().err

    def test_sql_subcommand_joins_fixture_views(self, spark, sf_small, capsys):
        rc = main(
            [
                "sql",
                "SELECT r_name, count(*) AS n FROM region JOIN nation"
                " ON n_regionkey = r_regionkey GROUP BY r_name ORDER BY r_name",
                "--sf-dir",
                sf_small,
            ]
        )
        assert rc == 0
        out = capsys.readouterr().out
        assert "r_name" in out and "AFRICA" in out
