"""CLI surface round-trip (spark-submit entrypoint): build -> query in
subprocesses, results rank-identical to the oracle."""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_cli_build_query_roundtrip(tmp_path):
    gen = (
        "import sys; sys.path.insert(0, %r)\n"
        "from webindex.session import get_spark\n"
        "from webindex.pagesgen import generate_pages_df\n"
        "s = get_spark(master='local[4]', shuffle_partitions=4)\n"
        "generate_pages_df(s, 200).write.mode('overwrite').parquet(%r)\n"
        "s.stop()\n" % (str(REPO), str(tmp_path / "pages"))
    )
    subprocess.run([sys.executable, "-c", gen], check=True, timeout=300,
                   capture_output=True, cwd=REPO)
    out = subprocess.run(
        [sys.executable, "-m", "webindex.cli", "build", str(tmp_path / "pages"),
         str(tmp_path / "idx")],
        check=True, timeout=300, capture_output=True, text=True, cwd=REPO,
    )
    assert "built: 200 docs" in out.stdout

    q = subprocess.run(
        [sys.executable, "-m", "webindex.cli", "query", str(tmp_path / "idx"),
         "the data", "5"],
        check=True, timeout=300, capture_output=True, text=True, cwd=REPO,
    )
    lines = [l for l in q.stdout.splitlines() if l and l[0].isdigit()]
    assert len(lines) == 5

    # rank-identity at the CLI surface, matched by url against the oracle
    from webindex.oracle import OracleIndex
    from webindex.pagesgen import make_page

    oracle = OracleIndex({i: make_page(i)["text"] for i in range(200)})
    exp = oracle.topk("the data", 5)
    exp_urls = [f"https://site{i % 1000}.example/page/{i}" for i, _ in exp]
    got_urls = [l.split("\t")[2] for l in lines]
    got_scores = [float(l.split("\t")[0]) for l in lines]
    assert got_urls == exp_urls
    for g, (_, e) in zip(got_scores, exp):
        assert abs(g - e) < 1e-5  # CLI prints 6dp
