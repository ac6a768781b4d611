import jax
import pytest


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices("cpu")
