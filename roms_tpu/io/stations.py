"""Station time-series extraction (STA stream, def_station.F/wrt_station.F).

Stations are fixed (j, i) grid locations; every call extracts the
selected fields at those points — one tiny gather per record, appended
host-side.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

from ..config import ModelConfig


class StationRecorder:
    def __init__(self, cfg: ModelConfig, stations: Sequence[Tuple[int, int]],
                 fields=("zeta", "temp", "salt", "u", "v")):
        self.cfg = cfg
        self.jj = np.array([s[0] for s in stations])
        self.ii = np.array([s[1] for s in stations])
        self.fields = fields
        self.times = []
        self.records = {f: [] for f in fields}

    def record(self, state):
        self.times.append(float(np.asarray(state.time)))
        for f in self.fields:
            if f == "temp":
                arr = np.asarray(state.t[0])
            elif f == "salt":
                arr = np.asarray(state.t[1])
            else:
                arr = np.asarray(getattr(state, f))
            self.records[f].append(arr[..., self.jj, self.ii])

    def arrays(self):
        """dict of (Nrec, [N,] Nsta) arrays + 'time'."""
        out = {f: np.stack(v) for f, v in self.records.items()}
        out["time"] = np.asarray(self.times)
        return out
