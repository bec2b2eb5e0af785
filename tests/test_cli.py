"""CLI end-to-end: parse a PHYLIP alignment, run -f e, check artifacts."""
import json
import pathlib
import subprocess
import sys

import pytest

DATA = pathlib.Path(__file__).resolve().parent / 'data'
REPO = pathlib.Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_cli_parse_and_run(tmp_path):
    env = {'PYTHONPATH': str(REPO), 'PATH': '/usr/bin:/bin',
           'HOME': str(tmp_path)}
    r = subprocess.run(
        [sys.executable, '-m', 'examl_tpu.cli', 'parse',
         '-s', str(DATA / 'aa20.phy'),
         '-q', str(DATA / 'aa20_lg4m.model'), '-n', 'cli_aa20'],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    assert (tmp_path / 'cli_aa20.binary').exists()

    r = subprocess.run(
        [sys.executable, '-m', 'examl_tpu.cli', 'run',
         '-s', str(tmp_path / 'cli_aa20.binary'),
         '-t', str(DATA / 'aa20.tree'), '-f', 'e', '-n', 'clirun',
         '--platform', 'cpu', '--f64', '-w', str(tmp_path)],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr
    info = (tmp_path / 'ExaML_info.clirun').read_text()
    assert 'Likelihood of best tree: -5063.295' in info
    assert (tmp_path / 'ExaML_result.clirun').exists()
    assert (tmp_path / 'ExaML_modelFile.clirun').exists()


def test_cli_S_flag_gating():
    """-S (induced-subtree compaction) is a tree-evaluation-mode flag:
    -f d must be rejected with a clear message (in-process main)."""
    from examl_tpu.cli import main
    with pytest.raises(SystemExit) as e:
        main(['run', '-s', str(DATA / '49.binary'),
              '-t', '/root/reference/testData/49.tree', '-n', 'sgate',
              '-f', 'd', '-S', '--platform', 'cpu', '-w', '/tmp'])
    assert 'compaction' in str(e.value)


@pytest.mark.slow
def test_cli_S_tree_evaluation(tmp_path):
    """-f e -S end to end through the CLI: model optimization at fixed
    branch lengths on the compacted engine; artifacts written."""
    from examl_tpu.cli import main
    rc = main(['run', '-s', str(DATA / '49.binary'),
               '-t', '/root/reference/testData/49.tree', '-n', 'scli',
               '-f', 'e', '-S', '--platform', 'cpu', '-w', str(tmp_path)])
    assert not rc
    info = (tmp_path / 'ExaML_info.scli').read_text()
    assert 'compaction' in info
    assert (tmp_path / 'ExaML_result.scli').exists()
