"""Every examples/ script must run green on CPU in CI-time (the
reference ships runnable per-cone tutorials; ours assert their own
analytic answers, so executing them IS the test)."""

import pathlib
import runpy

import pytest

EXAMPLES = sorted(
    (pathlib.Path(__file__).parent.parent / "examples").glob("*.py")
)


@pytest.mark.parametrize("path", EXAMPLES, ids=lambda p: p.name)
def test_example_runs(path, capsys):
    runpy.run_path(str(path), run_name="__main__")
    out = capsys.readouterr().out
    assert "ok" in out
