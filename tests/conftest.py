import os

# Parity tests run on the CPU backend in float64; multi-device tests use a
# virtual 8-device host platform. jax may already be imported (axon
# sitecustomize), so select the platform via jax.config, not env vars.
os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                           + ' --xla_force_host_platform_device_count=8')

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

def pytest_addoption(parser):
    parser.addoption('--runslow', action='store_true', default=False)
    parser.addoption('--runveryslow', action='store_true', default=False)


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest
    run_slow = config.getoption('--runslow')
    run_very = config.getoption('--runveryslow')
    skip_slow = _pytest.mark.skip(reason='slow; use --runslow')
    skip_very = _pytest.mark.skip(reason='1h+; use --runveryslow')
    for item in items:
        if 'veryslow' in item.keywords and not run_very:
            item.add_marker(skip_very)
        elif 'slow' in item.keywords and not (run_slow or run_very):
            item.add_marker(skip_slow)
