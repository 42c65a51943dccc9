"""Trips-domain test fixture generator (FIXTURES.md §1).

A small deterministic trips table matching the reference's raw schema
(generate_all.py:63-133 distributions, simplified), with injected
duplicate trip_ids (distinct ingested order) so keep-latest dedup has
true positives. Written fresh — numbers per FIXTURES.md, not reference
code.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd


def trips_pdf(n: int = 2000, seed: int = 7, n_dups: int = 50) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    base = dt.datetime(2024, 3, 1)
    requested = [
        base + dt.timedelta(minutes=int(m))
        for m in rng.integers(0, 60 * 24 * 30, n)
    ]
    status = rng.choice(
        ["completed", "cancelled_rider", "cancelled_driver"],
        n,
        p=[0.92, 0.06, 0.02],
    )
    distance = np.clip(rng.lognormal(1.2, 0.6, n), 0.5, 60).round(2)
    duration = np.clip(distance * 2.2 + rng.normal(5, 2, n), 3, 180).round(1)
    surge = np.clip(1.0 + rng.beta(2.5, 6, n) * 1.5, 1.0, 3.5).round(2)
    fare = np.clip(
        (2.5 + 1.15 * distance + 0.35 * duration) * surge, 3, 250
    ).round(2)
    pdf = pd.DataFrame(
        {
            "trip_id": np.arange(1, n + 1, dtype="int64"),
            "user_id": rng.integers(1, 500, n),
            "driver_id": rng.integers(1, 100, n),
            "pickup_zone_id": rng.integers(1, 50, n),
            "dropoff_zone_id": rng.integers(1, 50, n),
            "requested_at": requested,
            "status": status,
            "distance_km": distance,
            "duration_min": duration,
            "surge_multiplier": surge,
            "fare_amount": fare,
            "payment_method": rng.choice(
                ["card", "wallet", "CASH "], n, p=[0.78, 0.18, 0.04]
            ),
        }
    )
    pdf["started_at"] = pdf["requested_at"] + pd.to_timedelta(
        rng.integers(1, 12, n), unit="m"
    )
    pdf["completed_at"] = pdf["started_at"] + pd.to_timedelta(
        duration, unit="m"
    )
    # duplicate the first n_dups trips (later re-ingestion versions)
    dups = pdf.head(n_dups).copy()
    dups["fare_amount"] = (dups["fare_amount"] + 1.0).round(2)
    return pd.concat([pdf, dups], ignore_index=True)
