#!/usr/bin/env python
"""Merge a per-shard tensorstore HIS store (io.sharded_out, written by
`python -m roms_tpu ... --mesh ... --sharded-out DIR`) into one
reference-layout NetCDF file — the offline counterpart of the PIO
rearranger (mod_pio_netcdf.F role).

Usage: python tools/export_sharded_his.py STORE_DIR OUT.nc
"""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    from roms_tpu.io.sharded_out import export_netcdf
    export_netcdf(sys.argv[1], sys.argv[2])
    print(f"merged {sys.argv[1]} -> {sys.argv[2]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
