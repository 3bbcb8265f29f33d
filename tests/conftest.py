"""Test configuration: force the CPU backend with 8 virtual devices.

Sharding/collective tests run on a fake 8-device CPU mesh (the standard JAX
"fake backend": ``--xla_force_host_platform_device_count``), so the whole test
suite runs without TPU hardware. The benchmark harness (bench.py) does NOT
import this and runs on the real chip.
"""

import os

# Force CPU for tests even when the session default is the TPU tunnel
# (JAX_PLATFORMS=axon): the suite needs 8 virtual devices. jax may already
# be imported by site hooks, so set the config directly as well.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import sys
from pathlib import Path

import numpy as np
import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

ASSETS = Path("/root/reference/seamlessClone-OpenCV/images")


def _imread(path):
    import cv2

    img = cv2.imread(str(path))
    assert img is not None, f"missing test asset {path}"
    return img


@pytest.fixture(scope="session")
def airplane():
    return _imread(ASSETS / "airplane.jpg")


@pytest.fixture(scope="session")
def sky():
    return _imread(ASSETS / "sky.jpg")


@pytest.fixture(scope="session")
def irregular_mask(airplane):
    import cv2

    mask = np.zeros(airplane.shape[:2], np.uint8)
    cv2.circle(mask, (150, 97), 80, 255, -1)
    cv2.rectangle(mask, (40, 30), (260, 120), 255, -1)
    return mask


@pytest.fixture(scope="session")
def full_mask(airplane):
    return np.full(airplane.shape[:2], 255, np.uint8)


def diff_stats(a, b):
    """Absolute-difference stats (the vs.py acceptance metric): (sum, max)."""
    d = np.abs(np.asarray(a).astype(np.int64) - np.asarray(b).astype(np.int64))
    return int(d.sum()), int(d.max())


def psnr(a, b) -> float:
    """PSNR in dB between two u8 images (99.0 for identical)."""
    x = np.asarray(a, dtype=np.float64)
    y = np.asarray(b, dtype=np.float64)
    mse = np.mean((x - y) ** 2)
    return 99.0 if mse == 0 else float(10 * np.log10(255.0**2 / mse))
