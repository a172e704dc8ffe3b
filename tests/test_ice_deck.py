"""IPARNAM sea-ice parameter deck (read_phypar.F:4273 ice_inp chain,
reference deck ROMS/External/ice.in) through `python -m roms_tpu`."""

import numpy as np
import pytest

ICE_IN = """
! ice.in analog (ROMS/External/ice.in keywords)
        nEVP == 6
      AirRho == 1.267d0
      IceRho == 910.d0
  SnowDryRho == 330.d0
  SnowWetRho == 450.d0
       Cd_ai == 3.0d-3
       Cd_io == 7.5d-3
   Astrength == 20.d0
     zetaMin == 0.d0
     zetaMax == 1.0d+14
    ellip_sq == 4.d0
      min_ai == 0.01d0
      max_ai == 0.999d0
      min_hi == 0.01d0
   max_hmelt == 0.10d0
Hout(idUice) == T
"""


def test_load_ice_deck(tmp_path):
    from roms_tpu.io.ice_in import load_ice_deck
    p = tmp_path / "ice.in"
    p.write_text(ICE_IN)
    deck = load_ice_deck(str(p))
    c = deck.config
    assert c.nevp == 6
    assert c.rhoi == 910.0
    assert c.Cd_ai == pytest.approx(3.0e-3)
    assert c.Astrength == 20.0
    assert c.ai_max == pytest.approx(0.999)
    # inert-but-accepted keywords are reported, not dropped silently
    assert "MAX_HMELT" in deck.unused
    assert not deck.unknown


def test_ice_deck_validation(tmp_path):
    from roms_tpu.io.ice_in import load_ice_deck
    with pytest.raises(ValueError, match="nEVP"):
        load_ice_deck({"nEVP": 0})
    with pytest.raises(ValueError, match="min_ai"):
        load_ice_deck({"min_ai": 0.5, "max_ai": 0.2})


def _write_atm_frc(path, cfg):
    from scipy.io import netcdf_file
    Mj, Li = cfg.shape2d
    f = netcdf_file(path, "w", version=2)
    f.createDimension("wind_time", 2)
    f.createDimension("tair_time", 2)
    f.createDimension("eta_rho", Mj)
    f.createDimension("xi_rho", Li)
    for tname in ("wind_time", "tair_time"):
        t = f.createVariable(tname, "d", (tname,))
        t[:] = np.array([0.0, 86400.0])
        t.units = "seconds"
    for name, dim, val in (("Uwind", "wind_time", 6.0),
                           ("Vwind", "wind_time", 0.0),
                           ("Tair", "tair_time", -15.0)):
        v = f.createVariable(name, "d", (dim, "eta_rho", "xi_rho"))
        v[:] = np.full((2, Mj, Li), val)
    f.flush()
    f.close()


def test_iparnam_deck_end_to_end(capsys, tmp_path):
    """UPWELLING deck + IPARNAM + an FRCNAME atmosphere: the driver
    builds the EVP+thermo ice hook with the deck's parameters."""
    from roms_tpu.__main__ import main
    from roms_tpu.functionals import upwelling
    cfg = upwelling.make_config(Lm=16, Mm=8, N=4)
    ice_path = tmp_path / "ice.in"
    ice_path.write_text(ICE_IN)
    frc = str(tmp_path / "atm.nc")
    _write_atm_frc(frc, cfg)
    deck = str(tmp_path / "roms_ice.in")
    with open(deck, "w") as fh:
        fh.write(f"""
TITLE = upwelling + sea ice
MyAppCPP == UPWELLING
Lm == 16
Mm == 8
N == 4
NTIMES == 2
DT == 300.0d0
NDTFAST == 10
NRREC == 0
IPARNAM == {ice_path}
FRCNAME == {frc}
NHIS == 0
NRST == 0
NINFO == 0
""")
    rc = main([deck, "--outdir", str(tmp_path), "--dtype", "float64"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "sea ice from" in out and "nEVP=6" in out


def test_iparnam_requires_atmosphere(tmp_path):
    from roms_tpu.__main__ import main
    ice_path = tmp_path / "ice.in"
    ice_path.write_text(ICE_IN)
    deck = str(tmp_path / "roms_ice.in")
    with open(deck, "w") as fh:
        fh.write(f"""
TITLE = ice without atmosphere
MyAppCPP == UPWELLING
Lm == 16
Mm == 8
N == 4
NTIMES == 1
DT == 300.0d0
NDTFAST == 10
IPARNAM == {ice_path}
NHIS == 0
NRST == 0
NINFO == 0
""")
    with pytest.raises(SystemExit, match="atmosphere"):
        main([deck, "--outdir", str(tmp_path), "--dtype", "float64"])
