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


def ip_to_int_batch(ips: pd.Series) -> np.ndarray:
    """Vectorized ``ip_to_int`` over a string Series (r06, guide §4.2).

    One C regex pass extracts the four decimal octets; out-of-range parts
    -> 0 like the scalar path.  Rows the strict pattern rejects (unusual
    but scalar-accepted forms like ``"1. 2.3.4"`` — int() strips spaces)
    fall back to the scalar parser, preserving exact semantics."""
    s = ips.fillna("").astype(str)
    parts = s.str.extract(
        r"^(\d{1,9})\.(\d{1,9})\.(\d{1,9})\.(\d{1,9})$", expand=True
    )
    matched = parts[0].notna().to_numpy()
    octets = parts.fillna("0").astype(np.int64).to_numpy()
    ok = matched & (octets <= 255).all(axis=1)
    out = np.zeros(len(s), dtype=np.uint32)
    out[ok] = (
        (octets[ok, 0] << 24) | (octets[ok, 1] << 16)
        | (octets[ok, 2] << 8) | octets[ok, 3]
    ).astype(np.uint32)
    for i in np.flatnonzero(~matched):
        out[i] = ip_to_int(s.iat[int(i)])
    return out


def geolocate(df: DataFrame, blocks: GeoBlocks, ip_col: str = "ip") -> DataFrame:
    """Add country/region/city columns by broadcast range-join."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(blocks)

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        g: GeoBlocks = bc.value
        # per-task location columns aligned to the sorted block order, so
        # row assembly is a fancy-index instead of a per-row dict chain
        n_blocks = len(g.loc_ids)
        cols = {}
        gap = g.locations.get(-1)  # scalar path looked up loc_id -1 for gaps
        for key in ("country", "region", "city"):
            arr = np.empty(n_blocks + 1, dtype=object)  # [n_blocks] = gap
            arr[n_blocks] = gap[key] if gap else None
            for k in range(n_blocks):
                loc = g.locations.get(int(g.loc_ids[k]))
                arr[k] = loc[key] if loc else None
            cols[key] = arr
        for pdf in batches:
            ips = ip_to_int_batch(pdf[ip_col])
            # positional variant of GeoBlocks.lookup (same arithmetic)
            idx = np.searchsorted(g.lowers, ips, side="right") - 1
            pos = np.full(len(ips), n_blocks, dtype=np.int64)
            okm = idx >= 0
            in_range = np.zeros(len(ips), dtype=bool)
            in_range[okm] = ips[okm] <= g.uppers[idx[okm]]
            pos[in_range] = idx[in_range]
            yield pdf.assign(
                country=cols["country"][pos],
                region=cols["region"][pos],
                city=cols["city"][pos],
            )

    schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)
        + ", country string, region string, city string"
    )
    return df.mapInPandas(work, schema)
