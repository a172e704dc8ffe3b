"""BPARNAM biology parameter-file readers (io/bio_in.py, the
read_BioPar / *_inp.h analog) + the BIO_TOY application deck
end-to-end through ``python -m roms_tpu``."""

import os
import tempfile

import numpy as np
import pytest

pytestmark = pytest.mark.quick

REF_EXT = "/root/reference/ROMS/External"


def _ref(name):
    p = os.path.join(REF_EXT, name)
    if not os.path.isfile(p):
        pytest.skip("reference External decks not available")
    return p


class TestBioDeckParser:
    def test_detects_all_reference_models(self):
        from roms_tpu.io.bio_in import load_bio_deck
        expect = {
            "bio_Fennel.in": ("fennel", 7),
            "npzd_Powell.in": ("npzd_powell", 4),
            "npzd_Franks.in": ("npzd_franks", 4),
            "npzd_iron.in": ("npzd_iron", 6),
            "nemuro.in": ("nemuro", 11),
            "hypoxia_srm.in": ("hypoxia_srm", 1),
            "red_tide.in": ("red_tide", 1),
        }
        for fn, (model, nbio) in expect.items():
            d = load_bio_deck(_ref(fn))
            assert d.model == model, fn
            assert d.nbio == nbio, fn

    def test_fennel_values_land_in_config(self):
        from roms_tpu.io.bio_in import load_bio_deck
        d = load_bio_deck(_ref("bio_Fennel.in"))
        # bio_Fennel.in values (not the dataclass defaults for all)
        assert d.config.PhyCN == pytest.approx(6.625)
        assert d.config.ZooGR == pytest.approx(0.6)
        assert d.config.BioIter == 1
        assert isinstance(d.config.BioIter, int)

    def test_fennel_carbon_oxygen_flags_extend_block(self):
        from roms_tpu.io.bio_in import load_bio_deck
        d = load_bio_deck(_ref("bio_Fennel.in"), carbon=True,
                          oxygen=True)
        assert d.nbio == 12
        assert "iTAlk" in d.names and "iOxyg" in d.names
        assert d.config.carbon and d.config.oxygen

    def test_powell_bioini_values(self):
        from roms_tpu.io.bio_in import load_bio_deck
        d = load_bio_deck(_ref("npzd_Powell.in"))
        # BioIni(iNO3_) == 17.0 etc. in the reference deck
        assert set(d.bio_ini) == {0, 1, 2, 3}
        assert d.bio_ini[0] > 0

    def test_custom_deck_roundtrip(self):
        from roms_tpu.io.bio_in import load_bio_deck
        text = """
 Lbiology == T
  BioIter == 3
    K_ext == 0.07d0
    K_NO3 == 1.5d0
    ZooGA == 0.25d0
 BioIni(iNO3_) == 11.0d0
"""
        from roms_tpu.io.roms_in import parse_roms_in
        d = load_bio_deck(parse_roms_in(text))
        assert d.model == "npzd_franks"
        assert d.config.BioIter == 3
        assert d.config.K_ext == pytest.approx(0.07)
        assert d.bio_ini == {0: 11.0}

    def test_ecosim_refused_with_message(self):
        from roms_tpu.io.bio_in import detect_bio_model
        with pytest.raises(ValueError, match="EcoSim"):
            detect_bio_model({"NBands": 60})


def test_bio_toy_deck_end_to_end(capsys):
    """BIO_TOY deck (bio_toy.h) with a Fennel BPARNAM: tracer block
    extends to NT=9, biology runs inside the step, and the final
    state stays finite with positive bio tracers."""
    from roms_tpu.__main__ import main
    with tempfile.TemporaryDirectory() as d:
        bpar = os.path.join(d, "bio_Fennel.in")
        with open(bpar, "w") as fh:
            fh.write("""
 Lbiology == T
  BioIter == 1
  PARfrac == 0.43d0
    AttSW == 0.04d0
   AttChl == 0.02486d0
      Vp0 == 1.0d0
  Chl2C_m == 0.0535d0
    PhyCN == 6.625d0
    PhyIS == 0.025d0
    ZooGR == 0.6d0
   NitriR == 0.05d0
 BioIni(iNO3_) == 8.0d0
 BioIni(iNH4_) == 0.1d0
 BioIni(iChlo) == 0.2d0
 BioIni(iPhyt) == 0.15d0
 BioIni(iZoop) == 0.05d0
""")
        deck = os.path.join(d, "roms_bio_toy.in")
        with open(deck, "w") as fh:
            fh.write(f"""
TITLE = 1D biology toy
MyAppCPP == BIO_TOY
Lm == 4
Mm == 4
N == 16
NTIMES == 4
DT == 600.0d0
NDTFAST == 10
NRREC == 0
BPARNAM == {bpar}
NHIS == 0
NRST == 0
NINFO == 0
""")
        rc = main([deck, "--outdir", d, "--dtype", "float64"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "biology from" in out and "fennel" in out
    assert "+7 tracers, NT=9" in out


class TestSedDeckParser:
    def test_reference_sed_toy_deck(self):
        from roms_tpu.io.sed_in import load_sed_deck
        d = load_sed_deck(_ref("sediment_sed_toy.in"))
        # 2 mud classes + 1 sand class, mud first (read_sedpar idsed)
        assert d.nsed == 3
        assert d.names == ("mud_01", "mud_02", "sand_01")
        assert d.config.d50[2] == pytest.approx(1.0e-3)   # 1 mm sand
        assert d.config.Srho[1] == pytest.approx(2400.0)
        assert d.csed[1] == pytest.approx(10.0)
        assert d.newlayer_thick == pytest.approx(0.01)
        assert d.bedload_coeff == pytest.approx(0.05)

    def test_no_classes_raises(self):
        from roms_tpu.io.sed_in import load_sed_deck
        with pytest.raises(ValueError, match="no MUD_SD50"):
            load_sed_deck({"Lsediment": True})


def test_sed_toy_deck_with_sparnam_end_to_end(capsys):
    """SED_TOY deck + SPARNAM: sediment tracers appended (NT=NAT+3),
    bed state allocated, column hook active in the step."""
    from roms_tpu.__main__ import main
    with tempfile.TemporaryDirectory() as d:
        spar = os.path.join(d, "sediment.in")
        with open(spar, "w") as fh:
            fh.write("""
 Lsediment == T
 NEWLAYER_THICK == 0.01d0
 BEDLOAD_COEFF == 0.05d0
 MUD_SD50 == 0.01d0 0.005d0
 MUD_CSED == 0.0d0 10.0d0
 MUD_SRHO == 2650.0d0 2400.0d0
 MUD_WSED == 0.1d0 0.01d0
 MUD_ERATE == 5.0d-4 5.0d-4
 MUD_TAU_CE == 0.01d0 0.01d0
 MUD_POROS == 0.5d0 0.5d0
 SAND_SD50 == 1.0d0
 SAND_CSED == 0.0d0
 SAND_SRHO == 2650.0d0
 SAND_WSED == 1.0d0
 SAND_ERATE == 5.0d-4
 SAND_TAU_CE == 0.1d0
 SAND_POROS == 0.5d0
""")
        deck = os.path.join(d, "roms_sed_toy.in")
        with open(deck, "w") as fh:
            fh.write(f"""
TITLE = sed toy with SPARNAM
MyAppCPP == SED_TOY
Lm == 8
Mm == 8
N == 8
NTIMES == 3
DT == 60.0d0
NDTFAST == 10
NRREC == 0
SPARNAM == {spar}
NHIS == 0
NRST == 0
NINFO == 0
""")
        rc = main([deck, "--outdir", d, "--dtype", "float64"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "sediment from" in out
    assert "3 classes" in out and "NT=5" in out
