"""I/O metadata parity: varinfo.yaml loader, expanded registry, FLT
stream, get_hash checksums (VERDICT round-1 item 7)."""

import numpy as np
import pytest


class TestVarinfoYaml:
    def test_load_reference_yaml(self):
        from roms_tpu.io.varinfo_yaml import load_varinfo_yaml
        reg = load_varinfo_yaml(
            "/root/reference/ROMS/External/varinfo.yaml")
        # the reference defines ~701 variables
        assert len(reg) > 650, len(reg)
        z = reg["zeta"]
        assert z.location == "r2"
        assert z.long_name == "free-surface"
        assert z.units == "meter"
        assert z.index_code == "idFsur"
        assert reg["u"].location == "u3"
        assert reg["temp"].location == "r3"
        assert reg["AKv"].location == "w3"
        # bio variables present
        assert "NO3" in reg and reg["NO3"].location == "r3"
        # anchor/alias resolution: swrad's time variable resolves
        assert "swrad" in reg

    def test_native_registry_covers_subsystems(self):
        from roms_tpu.io.varinfo import REGISTRY
        for key in ("zeta", "u", "temp", "AKv", "hsbl", "hbbl",
                    "NO3", "NH4", "chlorophyll", "oxygen", "TIC",
                    "sand_01", "bed_thickness", "ice_a", "ice_u",
                    "Hwave", "u_stokes", "temp_hadv", "salt_vdif",
                    "shflux", "swrad", "lwrad", "latent", "sensible"):
            assert key in REGISTRY, key

    def test_yaml_overrides_native(self):
        from roms_tpu.io.varinfo_yaml import load_varinfo_yaml
        text = """
metadata:

  - variable:       zeta
    long_name:      my custom free surface
    units:          meter
    time:           ocean_time
    index_code:     idFsur
    type:           r2dvar
    scale:          2.0d0
"""
        reg = load_varinfo_yaml(text)
        assert reg["zeta"].long_name == "my custom free surface"
        assert reg["zeta"].scale == 2.0


class TestChecksum:
    def test_algorithms(self):
        from roms_tpu.io.checksum import get_hash, verify_hash
        a = np.linspace(0, 1, 1000, dtype=np.float32).reshape(10, 100)
        for alg in ("bitsum", "adler32", "crc32"):
            h = get_hash(a, alg)
            assert isinstance(h, int) and 0 <= h < 2 ** 32
            verify_hash(a, h, alg)           # round-trip ok
        from roms_tpu.core.errors import RomsError
        with pytest.raises(RomsError) as ei:
            verify_hash(a + 1.0, get_hash(a), "bitsum")
        assert ei.value.exit_flag == 4       # IO error

    def test_his_checksums(self, tmp_path):
        from scipy.io import netcdf_file
        from roms_tpu.core.stepping import Model
        from roms_tpu.functionals import upwelling
        from roms_tpu.io.netcdf import HistoryWriter
        from roms_tpu.io.checksum import verify_hash
        cfg = upwelling.make_config(Lm=16, Mm=16, N=8)
        grid = upwelling.make_grid(cfg)
        s = upwelling.make_initial(cfg, grid)
        path = str(tmp_path / "his.nc")
        w = HistoryWriter(path, cfg, grid, fields=("zeta", "temp"),
                          checksum="crc32")
        w.write(s)
        w.close()
        f = netcdf_file(path, "r", mmap=False)
        z = f.variables["zeta"][0]
        h = int(f.variables["zeta_checksum"][0])
        verify_hash(z, h, "crc32")


def test_flt_stream(tmp_path):
    """Floats advect + FLT NetCDF stream records trajectories with
    fill values for unbounded floats (wrt_floats.F)."""
    import jax.numpy as jnp
    from scipy.io import netcdf_file
    from roms_tpu.core.floats import Floats
    from roms_tpu.functionals import upwelling
    from roms_tpu.io.floats_nc import FloatsWriter, SPVAL
    cfg = upwelling.make_config(Lm=16, Mm=16, N=8)
    fl = Floats(x=jnp.array([3.0, 5.0]), y=jnp.array([4.0, 6.0]),
                s=jnp.array([-0.5, -0.1]),
                bounded=jnp.array([True, False]))
    path = str(tmp_path / "flt.nc")
    w = FloatsWriter(path, cfg, nfloats=2, sample_fields=("temp",))
    w.write(fl, time=0.0, samples={"temp": np.array([10.0, 11.0])})
    w.write(fl, time=300.0, samples={"temp": np.array([10.1, 11.0])})
    w.close()
    f = netcdf_file(path, "r", mmap=False)
    X = f.variables["Xgrid"][:]
    assert X.shape == (2, 2)
    assert X[0, 0] == np.float32(3.0)
    assert X[0, 1] == np.float32(SPVAL)      # unbounded -> fill
    assert f.variables["temp"][1, 0] == np.float32(10.1)


def test_restart_checksums_and_provenance(tmp_path):
    """Restart files carry per-leaf checksums (verified on read) and
    run-provenance attributes (wrt_info.F analog); corruption raises
    IO_ERROR."""
    import numpy as np
    from roms_tpu.core.errors import RomsError
    from roms_tpu.core.stepping import Model
    from roms_tpu.functionals import upwelling
    from roms_tpu.io.restart import (checkpoint_provenance,
                                     load_checkpoint, save_checkpoint)
    cfg = upwelling.make_config(Lm=8, Mm=8, N=4)
    grid = upwelling.make_grid(cfg)
    s0 = upwelling.make_initial(cfg, grid)
    path = str(tmp_path / "rst.npz")
    save_checkpoint(path, s0)
    prov = checkpoint_provenance(path)
    assert prov["type"] == "roms_tpu restart file"
    assert "creation_date" in prov and "code_revision" in prov
    s1 = load_checkpoint(path, s0)
    np.testing.assert_array_equal(np.asarray(s1.t), np.asarray(s0.t))
    # corrupt one leaf on disk -> IO_ERROR on verified load
    data = dict(np.load(path))
    key = [k for k in data if k.startswith("leaf_")][3]
    arr = data[key]
    if arr.size:
        arr = arr.copy().reshape(-1)
        arr[0] += 1.0
        data[key] = arr.reshape(data[key].shape)
    np.savez(path, **data)
    with pytest.raises(RomsError) as ei:
        load_checkpoint(path, s0)
    assert ei.value.exit_flag == 4


class TestVarinfoYamlEdgeCases:
    """Round-2 VERDICT weak item: exercise the 7951-line reference
    file's edge cases — anchors, d-exponent scales, trailing comments,
    duplicate entries (varinfo.yaml structure)."""

    def _ref(self):
        from roms_tpu.io.varinfo_yaml import load_varinfo_yaml
        return load_varinfo_yaml(
            "/root/reference/ROMS/External/varinfo.yaml")

    def test_every_entry_parsed(self):
        """701 `- variable:` blocks in the reference; the registry
        holds each unique name (duplicates keep the first, primary
        definition)."""
        import re
        with open("/root/reference/ROMS/External/varinfo.yaml") as fh:
            text = fh.read()
        names = []
        for line in text.splitlines():
            m = re.match(r"^  - variable:\s+(\S+)", line)
            if m:
                names.append(m.group(1))
        assert len(names) == 701
        reg = self._ref()
        assert len(reg) == len(set(n for n in names if not
                                   n.startswith("*")) |
                               {"swrad"}), (len(reg))

    def test_anchor_reference_in_variable_position(self):
        """`shortwave: &SWRAD swrad` at top level; line 1660 uses
        `*SWRAD` AS the variable name — must resolve to 'swrad'."""
        reg = self._ref()
        assert "swrad" in reg
        assert "*SWRAD" not in reg
        assert reg["swrad"].units == "watt meter-2"

    def test_d_exponent_scale_with_trailing_comment(self):
        """tide_period: `scale: 3600.0d0  # 60*60` (varinfo.yaml:2165)
        — Fortran d-exponent and the inline comment both handled."""
        reg = self._ref()
        assert reg["tide_period"].scale == 3600.0
        assert reg["tide_period"].units == "hours"

    def test_all_types_mapped(self):
        """Every `type:` value in the file maps to a known grid
        location (no silent nul fallbacks for staggered fields)."""
        import re
        with open("/root/reference/ROMS/External/varinfo.yaml") as fh:
            text = fh.read()
        types = set(re.findall(r"^\s+type:\s+(\S+)", text,
                               re.MULTILINE))
        from roms_tpu.io.varinfo_yaml import _TYPE_TO_LOC
        unmapped = types - set(_TYPE_TO_LOC)
        assert not unmapped, unmapped

    def test_state_variable_locations(self):
        reg = self._ref()
        assert reg["ubar"].location == "u2"
        assert reg["vbar"].location == "v2"
        assert reg["v"].location == "v3"
        assert reg["w"].location == "w3"
        assert reg["tke"].location == "w3"
