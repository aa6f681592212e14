"""Reference-replay oracle: a deliberately simple, single-threaded,
obviously-correct implementation of the CDC semantics (SURVEY §5.2 item 1).

Used only in tests, on driver-side pandas data, to check the distributed
salted/bucketed engine's final table state — both the live view and the
full SCD2 lineage. Mirrors the reference's sequential per-row apply model
(`Incremental1/IncrementalCustomer.py:640-712`) without its bugs.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass, field

import pandas as pd

END_OF_TIME = dt.datetime(9999, 12, 31)


@dataclass
class OracleState:
    payload_cols: list[str]  # e.g. ['role', 'text'] (+ 'tool' post-evolution)
    current: dict = field(default_factory=dict)  # key -> row dict
    history: list = field(default_factory=list)  # closed row dicts

    def evolve(self, new_cols: list[str]) -> None:
        for c in new_cols:
            if c not in self.payload_cols:
                self.payload_cols.append(c)
                for row in self.current.values():
                    row.setdefault(c, None)
                for row in self.history:
                    row.setdefault(c, None)

    def apply_batch(self, events: pd.DataFrame, batch_id: int) -> None:
        ev_payload = [
            c
            for c in events.columns
            if c not in ("cdc_flag", "cdc_dsn", "conv_id", "turn_idx")
        ]
        self.evolve(ev_payload)
        # LWW fold: keep the event with max (ts, cdc_dsn) per key.
        folded = (
            events.sort_values(["ts", "cdc_dsn"])
            .groupby(["conv_id", "turn_idx"], as_index=False)
            .tail(1)
        )
        for _, e in folded.iterrows():
            key = (e["conv_id"], int(e["turn_idx"]))
            ts = e["ts"].to_pydatetime() if hasattr(e["ts"], "to_pydatetime") else e["ts"]
            old = self.current.pop(key, None)
            if old is not None:
                closed = dict(old)
                closed["is_current"] = False
                closed["end_ts"] = ts
                self.history.append(closed)
            if e["cdc_flag"] == "D":
                if old is None:
                    # Delete with no current row: tombstone (zero-lifetime
                    # history row, payload NULL except ts, batch_id=-batch
                    # marker) — mirrors cdc/apply.py.
                    tomb = {"conv_id": key[0], "turn_idx": key[1]}
                    for c in self.payload_cols:
                        tomb[c] = ts if c == "ts" else None
                    tomb["is_current"] = False
                    tomb["effective_ts"] = ts
                    tomb["end_ts"] = ts
                    tomb["batch_id"] = -batch_id
                    self.history.append(tomb)
                continue
            new = {"conv_id": key[0], "turn_idx": key[1]}
            for c in self.payload_cols:
                v = e[c] if c in e.index else None
                if c == "ts":
                    v = ts
                elif pd.isna(v):
                    v = None
                if e["cdc_flag"] == "U" and old is not None and v is None:
                    v = old.get(c)
                new[c] = v
            new["is_current"] = True
            new["effective_ts"] = ts
            new["end_ts"] = END_OF_TIME
            new["batch_id"] = batch_id
            self.current[key] = new

    def current_df(self) -> pd.DataFrame:
        cols = ["conv_id", "turn_idx"] + self.payload_cols
        rows = [{c: r.get(c) for c in cols} for r in self.current.values()]
        return (
            pd.DataFrame(rows, columns=cols)
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )

    def full_df(self) -> pd.DataFrame:
        cols = (
            ["conv_id", "turn_idx"]
            + self.payload_cols
            + ["is_current", "effective_ts", "end_ts", "batch_id"]
        )
        rows = [{c: r.get(c) for c in cols} for r in list(self.current.values()) + self.history]
        return (
            pd.DataFrame(rows, columns=cols)
            .sort_values(["conv_id", "turn_idx", "effective_ts"], na_position="first")
            .reset_index(drop=True)
        )
