"""python -m roms_tpu <deck>: the oceanM-style standalone driver."""

import os
import subprocess
import sys

import pytest

DECK = "/root/reference/ROMS/External/roms_upwelling.in"


@pytest.mark.skipif(not os.path.exists(DECK),
                    reason="reference deck unavailable")
def test_main_driver_runs_reference_deck(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH="/root/repo")
    out = subprocess.run(
        [sys.executable, "-m", "roms_tpu", DECK, "--ntimes", "4",
         "--lm", "16", "--mm", "18", "--n", "6",
         "--outdir", str(tmp_path)],
        capture_output=True, text=True, timeout=600, env=env,
        cwd="/tmp")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "gridpoint-steps/s" in out.stdout
    assert "KINETIC_ENRG" in out.stdout          # deck NINFO table
    assert (tmp_path / "roms_his.nc").exists()
    assert (tmp_path / "roms_rst.nc").exists()


BM_DECK = "/root/reference/ROMS/External/roms_benchmark1.in"


@pytest.mark.skipif(not os.path.exists(BM_DECK),
                    reason="reference deck unavailable")
def test_main_driver_sharded_mesh(tmp_path):
    """Round-5: deck-driven multi-chip run through the explicit-halo
    engine (--mesh 2x4 on an 8-device virtual CPU mesh), forcing
    computed in-region from the app factory."""
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH="/root/repo",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    out = subprocess.run(
        [sys.executable, "-m", "roms_tpu", BM_DECK, "--ntimes", "4",
         "--lm", "64", "--mm", "32", "--n", "6", "--mesh", "2x4",
         "--outdir", str(tmp_path)],
        capture_output=True, text=True, timeout=900, env=env,
        cwd="/tmp")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "sharded engine on 2x4 mesh (forcing in-region)" \
        in out.stdout
    assert "gridpoint-steps/s" in out.stdout
    assert (tmp_path / "roms_his.nc").exists()
