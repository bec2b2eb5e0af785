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
