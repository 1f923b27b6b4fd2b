"""Deterministic GSOD-shaped fixture generation (FIXTURES.md §B, seed=42).

Produces the reference's real input shapes (untitled.py:25,44-48) in three
forms so every ingest path is testable:

- ``stations`` frame / CSV (≙ isd-history.csv) with sentinel/null LAT-LON
  rows and out-of-window BEGIN/END rows,
- ``observations`` frame / parquet with quality-flagged MAX/MIN/PRCP
  strings, orphan station keys, and ties on the max YEARMODA,
- raw `.op.gz` member files + per-year `.tar` archives (≙ gsod_all_years)
  for the S3/S4/S5 source tests.
"""

from __future__ import annotations

import gzip
import os
import random
import tarfile

import pandas as pd

YEARS = (2018, 2019, 2020)
N_STATIONS = 24


def make_stations(seed: int = 42) -> pd.DataFrame:
    rng = random.Random(seed)
    rows = []
    for i in range(N_STATIONS):
        usaf = f"{100000 + i}"
        wban = 10000 + i
        # rows 0-3: null/sentinel coordinates (filtered by P1/P2)
        if i < 2:
            lat, lon = None, None
        elif i < 4:
            lat, lon = 0.0, -999.0
        else:
            lat = round(rng.uniform(-60, 70), 3)
            lon = round(rng.uniform(-180, 180), 3)
        # rows 4-7: window-misfit BEGIN/END (filtered by P3)
        if 4 <= i < 6:
            begin, end = "20190105", f"{YEARS[-1]}1231"  # began too late
        elif 6 <= i < 8:
            begin, end = "20000101", "20181231"  # ended too early
        else:
            begin, end = "20000101", f"{YEARS[-1]}1231"
        elev = None if i % 7 == 0 else round(rng.uniform(-10, 3000), 1)
        state = None if i % 3 == 0 else rng.choice(["CA", "WA", "NY", "TX"])
        rows.append(
            {
                "USAF": usaf,
                "WBAN": wban,
                "STATION_NAME": f"STATION {i}" if i % 5 else None,
                "CTRY": rng.choice(["US", "CA", "MX", "FR"]),
                "STATE": state,
                "ICAO": f"K{i:03d}",
                "LAT": lat,
                "LON": lon,
                "ELEV_M": elev,
                "BEGIN": begin,
                "END": end,
            }
        )
    return pd.DataFrame(rows)


def make_observations(seed: int = 42) -> pd.DataFrame:
    """~20 in-dim stations × 3 years × 36 days (3/month), plus ~5% orphan
    keys; MAX/MIN carry `*` flags, PRCP a trailing quality letter; one
    station gets two rows on its max date (arg-max tie pin)."""
    rng = random.Random(seed + 1)
    rows = []
    station_keys = [(f"{100000 + i}", 10000 + i) for i in range(N_STATIONS)]
    station_keys.append(("999999", 99999))  # orphan key (dropped by J2)
    for usaf, wban in station_keys:
        for year in YEARS:
            for month in range(1, 13):
                for day in (3, 14, 25):
                    temp = round(rng.uniform(-20, 95), 1)
                    rows.append(
                        {
                            "USAF": usaf,
                            "WBAN": wban,
                            "YEARMODA": f"{year}{month:02d}{day:02d}",
                            "TEMP": temp,
                            "DEWP": round(temp - rng.uniform(0, 15), 1),
                            "WDSP": round(rng.uniform(0, 25), 1),
                            "MAX": f"{round(temp + rng.uniform(0, 12), 1)}"
                            + ("*" if rng.random() < 0.2 else ""),
                            "MIN": f"{round(temp - rng.uniform(0, 12), 1)}"
                            + ("*" if rng.random() < 0.2 else ""),
                            "PRCP": f"{round(rng.uniform(0, 2), 2):.2f}"
                            + rng.choice("ABCDEFGHI"),
                        }
                    )
    # plant a tie on the max date (YEARS[-1]-12-25) for surviving station 8:
    # one extra row on the same max date → 2 rows tied (reference keeps all
    # tied rows, untitled.py:80)
    rows.append(
        {
            "USAF": f"{100000 + 8}",
            "WBAN": 10000 + 8,
            "YEARMODA": f"{YEARS[-1]}1225",
            "TEMP": 1.0,
            "DEWP": 0.5,
            "WDSP": 3.0,
            "MAX": "5.0*",
            "MIN": "-5.0",
            "PRCP": "0.10G",
        }
    )
    return pd.DataFrame(rows)


#: GSOD-ish fixed-text header (22 logical columns as the reference's raw
#: files have; we emit the whitespace-separated layout its parser expects —
#: reference untitled.py:44-47's row indices [0,1,2,3,5,13,17,18,19])
_HEADER = (
    "STN--- WBAN   YEARMODA    TEMP       DEWP      SLP        STP       "
    "VISIB      WDSP     MXSPD   GUST    MAX     MIN   PRCP   SNDP   FRSHTT"
)


def observation_line(r: pd.Series) -> str:
    """One GSOD data line with filler count fields so the kept fields land
    at the reference's positional indices."""
    parts = [""] * 20
    parts[0] = str(r["USAF"])
    parts[1] = str(r["WBAN"])
    parts[2] = str(r["YEARMODA"])
    parts[3] = f"{r['TEMP']}"
    parts[4] = "24"
    parts[5] = f"{r['DEWP']}"
    parts[6] = "24"
    parts[7] = "9999.9"
    parts[8] = "24"
    parts[9] = "999.9"
    parts[10] = "24"
    parts[11] = "99.9"
    parts[12] = "24"
    parts[13] = f"{r['WDSP']}"
    parts[14] = "24"
    parts[15] = "12.3"
    parts[16] = "999.9"
    parts[17] = str(r["MAX"])
    parts[18] = str(r["MIN"])
    parts[19] = str(r["PRCP"])
    return " ".join(parts)


#: canonical fixture location shared by the Spark query
#: (`queries.gsod_reference_pipeline`) and its DuckDB oracle, which
#: re-derives the pipeline from the generator's ground-truth parquet.
DEFAULT_ROOT = "/tmp/snowfall-gsod-fixture-v1"


def tree_paths(root: str = DEFAULT_ROOT) -> dict[str, str]:
    return {
        "stations_csv": os.path.join(root, "isd-history.csv"),
        "stations_parquet": os.path.join(root, "stations.parquet"),
        "obs_parquet": os.path.join(root, "observations.parquet"),
        "op_dir": os.path.join(root, "op_files"),
        "tar_dir": os.path.join(root, "gsod_all_years"),
    }


def ensure_tree(root: str = DEFAULT_ROOT, seed: int = 42) -> dict[str, str]:
    """Idempotent fixture materialization: both the Spark query path and
    the oracle-SQL path call this, so the tree exists no matter which the
    driver evaluates first."""
    paths = tree_paths(root)
    if not all(os.path.exists(p) for p in paths.values()):
        return write_gsod_tree(root, seed)
    return paths


def write_gsod_tree(root: str, seed: int = 42) -> dict[str, str]:
    """Write the full fixture tree; returns paths:
    stations_csv, obs_parquet, op_dir (flat .op.gz files), tar_dir
    (per-year .tar of .op.gz members)."""
    os.makedirs(root, exist_ok=True)
    stations = make_stations(seed)
    obs = make_observations(seed)
    stations_csv = os.path.join(root, "isd-history.csv")
    stations.to_csv(stations_csv, index=False)
    obs_parquet = os.path.join(root, "observations.parquet")
    obs.to_parquet(obs_parquet, index=False)
    stations_parquet = os.path.join(root, "stations.parquet")
    stations.to_parquet(stations_parquet, index=False)

    op_dir = os.path.join(root, "op_files")
    tar_dir = os.path.join(root, "gsod_all_years")
    os.makedirs(op_dir, exist_ok=True)
    os.makedirs(tar_dir, exist_ok=True)
    obs["__year"] = obs["YEARMODA"].str[:4]
    for year, ydf in obs.groupby("__year"):
        tar_path = os.path.join(tar_dir, f"gsod_{year}.tar")
        with tarfile.open(tar_path, "w") as tar:
            for (usaf, wban), sdf in ydf.groupby(["USAF", "WBAN"]):
                name = f"{usaf}-{wban}-{year}.op.gz"
                body = _HEADER + "\n" + "\n".join(
                    observation_line(r) for _, r in sdf.iterrows()
                )
                payload = gzip.compress(body.encode())
                member_path = os.path.join(op_dir, name)
                with open(member_path, "wb") as f:
                    f.write(payload)
                info = tarfile.TarInfo(name=f"./{name}")
                info.size = len(payload)
                import io as _io

                tar.addfile(info, _io.BytesIO(payload))
    return {
        "stations_csv": stations_csv,
        "stations_parquet": stations_parquet,
        "obs_parquet": obs_parquet,
        "op_dir": op_dir,
        "tar_dir": tar_dir,
    }
