"""Geolocation range join (/root/reference/src/units/trgeolocator.pas).

IP string -> uint32 (trutilities.pas:481-507), binary search over sorted,
possibly non-adjacent [lower, upper] blocks (trgeolocator.pas:134-171) ->
location row (country, region, city).

Spark has no native interval join, so this is the one genuinely custom
join (SURVEY.md §4 custom work #3): the block table is broadcast and each
partition resolves its IPs with one vectorized ``np.searchsorted`` inside
``mapInPandas`` — O(log B) per row, no shuffle, no BroadcastNestedLoop.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def ip_to_int(ip: str) -> int:
    """Dotted IPv4 -> uint32 (trutilities.pas:481-507); 0 on malformed."""
    parts = ip.split(".")
    if len(parts) != 4:
        return 0
    try:
        a, b, c, d = (int(p) for p in parts)
    except ValueError:
        return 0
    if not all(0 <= x <= 255 for x in (a, b, c, d)):
        return 0
    return (a << 24) | (b << 16) | (c << 8) | d


class GeoBlocks:
    """Sorted block ranges + binary-search lookup (trgeolocator.pas:116-173)."""

    def __init__(self, lowers, uppers, loc_ids, locations: dict[int, dict]):
        order = np.argsort(lowers, kind="stable")
        self.lowers = np.asarray(lowers, dtype=np.uint32)[order]
        self.uppers = np.asarray(uppers, dtype=np.uint32)[order]
        self.loc_ids = np.asarray(loc_ids, dtype=np.int64)[order]
        self.locations = locations

    def lookup(self, ips: np.ndarray) -> np.ndarray:
        """(n,) uint32 -> (n,) loc_id or -1 (gap between blocks)."""
        idx = np.searchsorted(self.lowers, ips, side="right") - 1
        out = np.full(len(ips), -1, dtype=np.int64)
        ok = idx >= 0
        in_range = np.zeros(len(ips), dtype=bool)
        in_range[ok] = ips[ok] <= self.uppers[idx[ok]]
        out[in_range] = self.loc_ids[idx[in_range]]
        return out

    def locate(self, ip: str) -> dict | None:
        loc = self.lookup(np.array([ip_to_int(ip)], dtype=np.uint32))[0]
        return self.locations.get(int(loc))


def geolocate(df: DataFrame, blocks: GeoBlocks, ip_col: str = "ip") -> DataFrame:
    """Add country/region/city columns by broadcast range-join."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(blocks)

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        g: GeoBlocks = bc.value
        for pdf in batches:
            ips = np.fromiter(
                (ip_to_int(ip) for ip in pdf[ip_col].fillna("")),
                dtype=np.uint32,
                count=len(pdf),
            )
            locs = g.lookup(ips)
            rows = [g.locations.get(int(l)) for l in locs]
            yield pdf.assign(
                country=[r["country"] if r else None for r in rows],
                region=[r["region"] if r else None for r in rows],
                city=[r["city"] if r else None for r in rows],
            )

    schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)
        + ", country string, region string, city string"
    )
    return df.mapInPandas(work, schema)
