"""End-to-end smoke of every CLI verb (the reference console surface:
index / search / lookup / print — ConsoleUtil/Program.cs — plus rank).
Runs through cli.main's argparse wiring against a real blocks index."""

import datetime

import pytest


@pytest.fixture(scope="module")
def cli_index_root(spark, tmp_path_factory):
    from fulltextsearch_spark import cli
    from fulltextsearch_spark.sources.pages import PAGES_SCHEMA

    epoch = datetime.datetime(2020, 1, 1, tzinfo=datetime.timezone.utc)
    rows = [
        (
            f"u{i}",
            epoch,
            b"",
            f"cli smoke doc {i} {'common' if i % 2 else 'sparse'}",
            "en",
        )
        for i in range(20)
    ]
    pages_path = str(tmp_path_factory.mktemp("cli_pages") / "pages.parquet")
    spark.createDataFrame(rows, PAGES_SCHEMA).write.parquet(pages_path)
    root = str(tmp_path_factory.mktemp("cli_idx") / "idx")
    assert (
        cli.main(
            ["index", "--input", pages_path, "--root", root, "--mode", "blocks"]
        )
        == 0
    )
    return root


def test_cli_index_reports_commit(cli_index_root, capsys):
    pass  # the fixture's index call already asserted rc 0


def test_cli_search(cli_index_root, capsys):
    from fulltextsearch_spark import cli

    assert (
        cli.main(["search", "--root", cli_index_root, "--query", "WORD(common)"])
        == 0
    )
    out = capsys.readouterr().out
    # 10 even docs carry 'common' at position 5
    assert out.count("{") == 10 and ",1,5]" in out


def test_cli_lookup(cli_index_root, capsys):
    from fulltextsearch_spark import cli

    assert (
        cli.main(["lookup", "--root", cli_index_root, "--query", "WILD(s*)"])
        == 0
    )
    assert capsys.readouterr().out.split() == ["smoke", "sparse"]


def test_cli_rank(cli_index_root, capsys):
    from fulltextsearch_spark import cli

    assert (
        cli.main(
            [
                "rank",
                "--root",
                cli_index_root,
                "--query",
                "OR(WORD(common),WORD(sparse))",
                "-k",
                "3",
            ]
        )
        == 0
    )
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 3
    assert all(len(line.split("\t")) == 2 for line in lines)


def test_cli_print(cli_index_root, capsys):
    from fulltextsearch_spark import cli

    assert cli.main(["print", "--root", cli_index_root]) == 0
    out = capsys.readouterr().out
    assert "common -> " in out and "sparse -> " in out
