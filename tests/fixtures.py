"""Reference-shaped synthetic fixtures (FIXTURES.md): stations CSV, dict-root
weather JSON, weekly journey CSVs in monthly folders with header variants,
NULL station numbers, and stations unknown to the dim. Deterministic
(seeded) so tests are reproducible."""

from __future__ import annotations

import csv
import json
import random
from datetime import datetime, timedelta
from pathlib import Path

SEED = 42


def write_stations_csv(path: Path, n: int = 20) -> None:
    rng = random.Random(SEED)
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["Station.Id", "StationName", "easting", "northing", "longitude", "latitude"])
        for i in range(1, n + 1):
            w.writerow(
                [
                    i,
                    f"Station {i}",
                    round(rng.uniform(525000, 535000), 1),
                    round(rng.uniform(175000, 185000), 1),
                    round(rng.uniform(-0.2, 0.0), 6) if rng.random() > 0.1 else "",
                    round(rng.uniform(51.4, 51.6), 6) if rng.random() > 0.1 else "",
                ]
            )


def write_weather_json(path: Path, days: int = 30, root_key: str = "days") -> None:
    """Dict-root payload ({'days': [...]}) — exercises the S8 normalization."""
    rng = random.Random(SEED)
    records = []
    base = datetime(2021, 3, 1)
    for d in range(days):
        date = (base + timedelta(days=d)).strftime("%Y-%m-%d")
        rec = {
            "datetime": date,
            "datetimeEpoch": int((base + timedelta(days=d)).timestamp()),
            "tempmax": round(rng.uniform(5, 20), 1),
            "tempmin": round(rng.uniform(-2, 10), 1),
            "temp": round(rng.uniform(2, 15), 1),
            "feelslike": round(rng.uniform(0, 15), 1),
            "humidity": round(rng.uniform(40, 95), 1),
            "precip": round(rng.uniform(0, 12), 2),
            "windspeed": round(rng.uniform(0, 40), 1),
            "conditions": rng.choice(["Rain", "Clear", "Overcast"]),
            "description": "synthetic day",
            "icon": "cloudy",
            "stations": ["S1", "S2"],
            "preciptype": ["rain"] if rng.random() > 0.5 else None,
            "source": "obs",
            # sparse columns (>70% NULL) — drive the null-profile drop
            "precipprob": round(rng.uniform(0, 100), 1) if rng.random() > 0.8 else None,
            "snow": round(rng.uniform(0, 5), 1) if rng.random() > 0.9 else None,
            "snowdepth": None,
            "severerisk": round(rng.uniform(0, 100), 1) if rng.random() > 0.85 else None,
        }
        records.append(rec)
    path.write_text(json.dumps({root_key: records}))


def write_journey_csvs(root: Path, n_files: int = 3, rows_per_file: int = 200) -> dict:
    """Weekly files in raw/cycling-journey/MonYYYY/ folders. File 0 uses the
    'Start Date' header variant; later files use 'Start date'. ~2% NULL
    station numbers; station ids 15-30 (ids >20 are unknown to the dim)."""
    rng = random.Random(SEED)
    stats: dict = {"rows": 0, "null_start": 0, "unknown_ids": set()}
    base = datetime(2021, 3, 3, 6, 0)
    for fi in range(n_files):
        month_dir = root / "raw" / "cycling-journey" / (base + timedelta(days=30 * fi)).strftime("%b%Y")
        month_dir.mkdir(parents=True, exist_ok=True)
        variant_caps = fi == 0
        start_h = "Start Date" if variant_caps else "Start date"
        end_h = "End Date" if variant_caps else "End date"
        fpath = month_dir / f"{300 + fi}JourneyDataExtract.csv"
        with open(fpath, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(
                ["Number", "Bike number", start_h, end_h,
                 "Start station number", "Start station",
                 "End station number", "End station",
                 "Bike model", "Total duration", "Total duration (ms)"]
            )
            for r in range(rows_per_file):
                start = base + timedelta(days=30 * fi + rng.randint(0, 6), minutes=rng.randint(0, 1200))
                dur_min = rng.randint(4, 90)
                end = start + timedelta(minutes=dur_min)
                s_id = rng.randint(15, 30) if rng.random() > 0.02 else None
                e_id = rng.randint(15, 30) if rng.random() > 0.02 else None
                if s_id is None:
                    stats["null_start"] += 1
                for sid in (s_id, e_id):
                    if sid is not None and sid > 20:
                        stats["unknown_ids"].add(sid)
                w.writerow(
                    [
                        1000000 + stats["rows"],
                        rng.randint(10000, 20000),
                        start.strftime("%d/%m/%Y %H:%M"),
                        end.strftime("%d/%m/%Y %H:%M"),
                        s_id if s_id is not None else "",
                        f"Station {s_id}" if s_id is not None else "",
                        e_id if e_id is not None else "",
                        f"Station {e_id}" if e_id is not None else "",
                        "CLASSIC" if rng.random() < 0.82 else "PBSC_EBIKE",
                        f"{dur_min}m 0s",
                        dur_min * 60000,
                    ]
                )
                stats["rows"] += 1
    return stats
