"""ERA5 training-time dataset loaders.

Capability parity with the reference loaders
(/root/reference/cra5/dataset/era5_base_npy.py:98 era5_base_npy,
era5_base_nc.py:99): per-channel ``.npy`` assembly with the reference's
directory scheme ``{year}/{date}/{hour}-{vname}{level}.npy``, timestamp
arithmetic for input/gt sequence pairs (sequence_cfg), mean/std
normalization, and NetCDF full-timestep reads matching the downloader's
``{ts}_pressure.nc`` / ``{ts}_single.nc`` pair.

TPU-first re-design: the reference's fragile multiprocessing
shared-memory pipeline (cra5_base.py:218-263, fixed 20-slot PID table)
is replaced by a simple indexable dataset + the thread-pool
``PrefetchLoader`` (prefetch.py) that overlaps host IO with device
compute — the idiomatic host-side feed for a single-controller JAX
program.
"""

from __future__ import annotations

import datetime as _dt
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def timestamp_range(start: str, end: str, interval_hours: int = 6) -> List[str]:
    """Inclusive ISO timestamps like the reference's pd.date_range usage
    (era5_base_npy.py:160)."""
    t0 = _dt.datetime.fromisoformat(start)
    t1 = _dt.datetime.fromisoformat(end)
    out = []
    t = t0
    step = _dt.timedelta(hours=interval_hours)
    while t <= t1:
        out.append(t.isoformat())
        t += step
    return out


def _ts_to_npy_dir(ts: str) -> str:
    """'1979-01-01T06:00:00' -> '1979/1979-01-01/06:00:00' (reference
    era5_base_npy.py:175 file_list construction)."""
    d = _dt.datetime.fromisoformat(ts)
    return os.path.join(str(d.year), d.date().isoformat(), d.time().isoformat())


class ERA5NpyDataset:
    """Assemble (C, H, W) timesteps from per-channel .npy files.

    File scheme: ``{root}/{year}/{date}/{time}-{vname}{level}.npy`` for
    pressure variables and ``{root}/{year}/{date}/{time}-{vname}.npy``
    for surface variables (reference era5_base_npy.py:340-380).

    sequence_cfg: {"input": [0], "gt": [0]} hour offsets; __getitem__
    returns {"inputs": (T_in, C, H, W), "gt": (T_gt, C, H, W)}.
    """

    def __init__(
        self,
        root: str,
        vnames: Dict[str, Sequence[str]],
        pressure_level: Sequence[int],
        years: Tuple[str, str],
        time_interval: int = 6,
        sequence_cfg: Optional[Dict[str, Sequence[int]]] = None,
        mean: Optional[np.ndarray] = None,
        std: Optional[np.ndarray] = None,
        num_samples: Optional[int] = None,
    ):
        self.root = root
        self.pressure_vnames = list(vnames.get("pressure", []))
        self.single_vnames = list(vnames.get("single", []))
        self.pressure_level = list(pressure_level)
        self.sequence_cfg = sequence_cfg or {"input": [0], "gt": [0]}
        self.mean = mean
        self.std = std

        stamps = timestamp_range(years[0], years[1], time_interval)
        max_off = max(
            max(self.sequence_cfg["input"], default=0),
            max(self.sequence_cfg["gt"], default=0),
        )
        usable = len(stamps) - max_off // time_interval
        self.timestamps = stamps[: max(usable, 0)]
        self.time_interval = time_interval
        if num_samples:
            self.timestamps = self.timestamps[:num_samples]

    def __len__(self) -> int:
        return len(self.timestamps)

    @property
    def num_channels(self) -> int:
        return len(self.pressure_vnames) * len(self.pressure_level) + len(
            self.single_vnames
        )

    def channel_names(self) -> List[str]:
        names = [
            f"{v}{l}" for v in self.pressure_vnames for l in self.pressure_level
        ]
        names += list(self.single_vnames)
        return names

    def _load_timestep(self, ts: str) -> np.ndarray:
        base = os.path.join(self.root, _ts_to_npy_dir(ts))
        chans = []
        for name in self.channel_names():
            path = f"{base}-{name}.npy"
            chans.append(np.load(path).astype(np.float32))
        data = np.stack(chans)
        if self.mean is not None:
            data = (data - self.mean.reshape(-1, 1, 1)) / self.std.reshape(-1, 1, 1)
        return data

    def _offset_ts(self, ts: str, hours: int) -> str:
        return (
            _dt.datetime.fromisoformat(ts) + _dt.timedelta(hours=hours)
        ).isoformat()

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        ts = self.timestamps[index]
        inputs = np.stack(
            [self._load_timestep(self._offset_ts(ts, h)) for h in self.sequence_cfg["input"]]
        )
        gt = np.stack(
            [self._load_timestep(self._offset_ts(ts, h)) for h in self.sequence_cfg["gt"]]
        )
        return {"inputs": inputs, "gt": gt, "timestamp": ts}

    @staticmethod
    def save_timestep(root: str, ts: str, data: np.ndarray, names: Sequence[str]) -> None:
        """Write one (C, H, W) timestep in the per-channel scheme (used by
        tests and archive tooling)."""
        base = os.path.join(root, _ts_to_npy_dir(ts))
        os.makedirs(os.path.dirname(base), exist_ok=True)
        for c, name in enumerate(names):
            np.save(f"{base}-{name}.npy", data[c])


class ERA5NcDataset:
    """Full-timestep NetCDF dataset over downloader-produced pairs
    ``{ts}_pressure.nc`` + ``{ts}_single.nc`` (reference era5_base_nc.py
    and cra5/api layout)."""

    def __init__(
        self,
        cfg,
        root: str,
        timestamps: Sequence[str],
        normalize: bool = True,
    ):
        from ..api.era5 import load_mean_std, read_data_from_nc

        self.cfg = cfg
        self.root = root
        self.timestamps = list(timestamps)
        self.normalize = normalize
        self._read = read_data_from_nc
        if normalize:
            self.mean, self.std = load_mean_std(cfg)

    def __len__(self) -> int:
        return len(self.timestamps)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        ts = self.timestamps[index]
        data = self._read(self.cfg, self.root, ts).astype(np.float32)
        if self.normalize:
            data = (data - self.mean.reshape(-1, 1, 1)) / self.std.reshape(-1, 1, 1)
        return {"inputs": data[None], "gt": data[None], "timestamp": ts}
