"""README's performance section must be generated, not hand-edited: it has
to match what tools/readme_perf.py renders from the committed bench_results/
files (the one-benchmark-truth discipline — a hand-copied fps number that
drifts from the measurement files fails here)."""

from tools import readme_perf


def test_readme_perf_block_matches_committed_results():
    text = readme_perf.README.read_text()
    assert readme_perf.BEGIN in text and readme_perf.END in text
    inner = text.split(readme_perf.BEGIN, 1)[1].split(readme_perf.END, 1)[0]
    assert inner == "\n" + readme_perf.render_block(), (
        "README.md perf block drifted from bench_results/ — run "
        "python -m tools.readme_perf"
    )


def test_bench_json_self_describes():
    """The committed canonical bench line must carry the measurement caveat
    as a field (VERDICT r4 #3): a reader of the JSON alone learns what the
    fps number is on this runtime."""
    bench = readme_perf._load("bench.json")
    if bench is None:
        return  # placeholder state before the first committed TPU run
    assert "measures" in bench and "throughput" in bench["measures"]
    assert bench["unit"] == "fps"
