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


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest
    if config.getoption('--runslow'):
        return
    skip = _pytest.mark.skip(reason='slow; use --runslow')
    for item in items:
        if 'slow' in item.keywords:
            item.add_marker(skip)
