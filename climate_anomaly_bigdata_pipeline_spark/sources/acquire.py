"""Data acquisition (SURVEY §2.1 S1/S2): plain-Python download step with
synthetic fallbacks — outside Spark, as in the reference.

Mirrors ``jobs/00_download_data.py``: stream public datasets to local
disk (8 KB chunks, bounded timeout), falling back to deterministic
synthetic files when the network is unavailable.

Bug fixed vs the reference: its synthetic Berkeley fallback emits
5 fields per row (``00_download_data.py:41``) while the Silver parser
reads ``tokens[5]`` — so the fallback path silently parses to all-null
anomalies and yields an EMPTY silver table (SURVEY §2.1 S2). The
generator here emits the real 6-column layout (leading date-number,
day-of-year in column 4), so the fallback actually flows through the
pipeline.
"""

from __future__ import annotations

import hashlib
import os


def download_file(
    url: str, dest: str, chunk_size: int = 8192, timeout: float = 10.0
) -> bool:
    """Stream ``url`` to ``dest``; True on success, False on any failure
    (caller falls back to synthetic data, as job 00 does)."""
    try:
        from urllib.request import urlopen

        with urlopen(url, timeout=timeout) as resp, open(dest, "wb") as out:
            while True:
                chunk = resp.read(chunk_size)
                if not chunk:
                    break
                out.write(chunk)
        return True
    except Exception:
        if os.path.exists(dest):
            os.remove(dest)
        return False


def _unit_noise(*parts: object) -> float:
    """Deterministic pseudo-noise in [-1, 1) from md5 — the portable
    stand-in for the reference's seeded ``hash(...) % 100`` recipe
    (``jobs/03_silver_to_gold.py:96-97``), reproducible in any engine."""
    h = hashlib.md5(":".join(str(p) for p in parts).encode()).hexdigest()
    return (int(h[:8], 16) % 20000) / 10000.0 - 1.0


def write_synthetic_berkeley(dest: str, years: int = 5, start_year: int = 2000) -> int:
    """Synthetic Berkeley Earth daily file in the REAL 6-column layout:
    ``seq  year  month  day  date_number  anomaly`` plus ``%`` header
    comments. Anomalies are deterministic in (−2, 2)."""
    n = 0
    with open(dest, "w") as f:
        f.write("% Synthetic Berkeley Earth daily TAVG (fallback)\n")
        f.write("% seq year month day date_number anomaly\n")
        seq = 0
        for y in range(start_year, start_year + years):
            for m in range(1, 13):
                for d in range(1, 29):  # 28 days/month keeps it simple & valid
                    seq += 1
                    doy = (m - 1) * 28 + d
                    date_num = y + doy / 336.0
                    anomaly = 2.0 * _unit_noise(y, m, d)
                    f.write(
                        f"{seq:6d}  {y}  {m:02d}  {d:02d}  {date_num:.3f}  "
                        f"{anomaly:.3f}\n"
                    )
                    n += 1
    return n


def write_synthetic_stations(dest: str, n_stations: int = 10) -> int:
    """Synthetic GHCND station rows in the published fixed-width layout
    (1-based positions per SURVEY §2.2 P4)."""
    with open(dest, "w") as f:
        for i in range(1, n_stations + 1):
            sid = f"USW{i:08d}"
            lat = 25.0 + 25.0 * abs(_unit_noise("lat", i))
            lon = -120.0 + 40.0 * abs(_unit_noise("lon", i))
            elev = 10.0 + 990.0 * abs(_unit_noise("elev", i))
            state = ["NY", "CA", "TX", "WA", "CO"][i % 5]
            name = f"TEST_STATION_{i}"
            line = (
                f"{sid:<11s} {lat:8.4f} {lon:9.4f} {elev:6.1f}  "
                f"{state:<2s} {name:<30s}"
            )
            f.write(line.rstrip() + "\n")
    return n_stations


def acquire(
    raw_dir: str,
    berkeley_url: str | None = None,
    stations_url: str | None = None,
) -> dict[str, str]:
    """Job-00 equivalent: download each feed, fall back to synthetic.
    Returns feed → local path."""
    os.makedirs(raw_dir, exist_ok=True)
    paths = {
        "berkeley": os.path.join(raw_dir, "berkeley_daily.txt"),
        "stations": os.path.join(raw_dir, "ghcnd_stations.txt"),
    }
    if not (berkeley_url and download_file(berkeley_url, paths["berkeley"])):
        write_synthetic_berkeley(paths["berkeley"])
    if not (stations_url and download_file(stations_url, paths["stations"])):
        write_synthetic_stations(paths["stations"])
    return paths
