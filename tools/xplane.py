"""Minimal XSpace (jax.profiler .xplane.pb) reader — pure Python.

The installed tensorboard-plugin-profile cannot convert this JAX version's
xspace protos (missing converter API — VERDICT r4 missing #2), which left
device-level time attribution blind. The wire format is plain protobuf and
the schema is small, so this module decodes it directly: no protoc, no
tensorflow, no plugin.

Schema (tensorflow/core/profiler/protobuf/xplane.proto):
  XSpace:   planes=1
  XPlane:   id=1, name=2, lines=3, event_metadata=4 (map), stat_metadata=5
  XLine:    id=1, name=2, timestamp_ns=3, events=4, display_name=11
  XEvent:   metadata_id=1, offset_ps=2, duration_ps=3, stats=4
  XEventMetadata: id=1, name=2
  XStatMetadata:  id=1, name=2
  XStat:    metadata_id=1, double=2, uint64=3, int64=4, str=5, ref=7

CLI:
  python tools/xplane.py <dir-or-.pb> [--plane SUBSTR] [--line SUBSTR]
                         [--top N] [--group-by-line]

Prints per-event-name total/self duration on the matching plane's lines —
the device-op time attribution the round-5 posebwd work needs.
"""

from __future__ import annotations

import gzip
from collections import defaultdict
from pathlib import Path

__all__ = ["parse_xspace", "plane_report", "find_xplane"]


def _varint(b: bytes, i: int):
    r = s = 0
    while True:
        x = b[i]
        i += 1
        r |= (x & 0x7F) << s
        if not x & 0x80:
            return r, i
        s += 7


def _fields(b: bytes):
    """Yield (field_number, wire_type, value) over a protobuf message."""
    i, n = 0, len(b)
    while i < n:
        tag, i = _varint(b, i)
        fnum, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _varint(b, i)
        elif wt == 1:
            v, i = b[i:i + 8], i + 8
        elif wt == 2:
            ln, i = _varint(b, i)
            v, i = b[i:i + ln], i + ln
        elif wt == 5:
            v, i = b[i:i + 4], i + 4
        else:  # groups (3/4) never appear in xplane
            raise ValueError(f"unsupported wire type {wt}")
        yield fnum, wt, v


def _parse_stat(b: bytes):
    st = {"metadata_id": 0, "value": None}
    import struct

    for f, wt, v in _fields(b):
        if f == 1:
            st["metadata_id"] = v
        elif f == 2:
            st["value"] = struct.unpack("<d", v)[0]
        elif f in (3, 4, 8):
            st["value"] = v
        elif f == 5:
            st["value"] = v.decode("utf-8", "replace")
        elif f == 7:
            st["ref"] = v  # index into stat_metadata? no — value ref
    return st


def _parse_event(b: bytes):
    ev = {"metadata_id": 0, "offset_ps": 0, "duration_ps": 0, "stats": []}
    for f, wt, v in _fields(b):
        if f == 1:
            ev["metadata_id"] = v
        elif f == 2:
            # zigzag? offset_ps is int64 (not sint) — plain varint
            ev["offset_ps"] = v
        elif f == 3:
            ev["duration_ps"] = v
        elif f == 4:
            ev["stats"].append(_parse_stat(v))
        elif f == 5:
            ev["num_occurrences"] = v
    return ev


def _parse_line(b: bytes):
    ln = {"id": 0, "name": "", "timestamp_ns": 0, "events": [],
          "display_name": ""}
    for f, wt, v in _fields(b):
        if f == 1:
            ln["id"] = v
        elif f == 2:
            ln["name"] = v.decode("utf-8", "replace")
        elif f == 3:
            ln["timestamp_ns"] = v
        elif f == 4:
            ln["events"].append(_parse_event(v))
        elif f == 11:
            ln["display_name"] = v.decode("utf-8", "replace")
    return ln


def _parse_named_metadata(b: bytes):
    """XEventMetadata / XStatMetadata map entry value -> (id, name)."""
    mid, name = 0, ""
    for f, wt, v in _fields(b):
        if f == 1:
            mid = v
        elif f == 2:
            name = v.decode("utf-8", "replace")
    return mid, name


def _parse_map_entry(b: bytes):
    """proto map<int64, XMeta> entry: key=1, value=2."""
    key, val = 0, b""
    for f, wt, v in _fields(b):
        if f == 1:
            key = v
        elif f == 2:
            val = v
    return key, val


def _parse_plane(b: bytes):
    pl = {"id": 0, "name": "", "lines": [], "event_metadata": {},
          "stat_metadata": {}}
    for f, wt, v in _fields(b):
        if f == 1:
            pl["id"] = v
        elif f == 2:
            pl["name"] = v.decode("utf-8", "replace")
        elif f == 3:
            pl["lines"].append(_parse_line(v))
        elif f == 4:
            k, val = _parse_map_entry(v)
            mid, name = _parse_named_metadata(val)
            pl["event_metadata"][k] = name
        elif f == 5:
            k, val = _parse_map_entry(v)
            mid, name = _parse_named_metadata(val)
            pl["stat_metadata"][k] = name
    return pl


def parse_xspace(path) -> list:
    """Parse an .xplane.pb file (optionally gzipped) -> list of planes."""
    data = Path(path).read_bytes()
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    planes = []
    for f, wt, v in _fields(data):
        if f == 1:
            planes.append(_parse_plane(v))
    return planes


def find_xplane(root) -> Path:
    """Locate the newest .xplane.pb under a jax.profiler log dir."""
    root = Path(root)
    if root.is_file():
        return root
    cands = sorted(root.rglob("*.xplane.pb"),
                   key=lambda p: p.stat().st_mtime)
    if not cands:
        raise FileNotFoundError(f"no .xplane.pb under {root}")
    return cands[-1]


def plane_report(plane, line_filter: str = "", top: int = 40):
    """Aggregate event durations by name per line. Returns
    {line_name: [(event_name, total_ms, count), ...]} sorted by time."""
    out = {}
    meta = plane["event_metadata"]
    for line in plane["lines"]:
        lname = line["display_name"] or line["name"]
        if line_filter and line_filter not in lname:
            continue
        agg = defaultdict(lambda: [0, 0])
        for ev in line["events"]:
            name = meta.get(ev["metadata_id"], f"#{ev['metadata_id']}")
            agg[name][0] += ev["duration_ps"]
            agg[name][1] += 1
        rows = sorted(((n, ps / 1e9, c) for n, (ps, c) in agg.items()),
                      key=lambda r: -r[1])[:top]
        if rows:
            out[lname] = rows
    return out


def main():
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("path", help="trace dir or .xplane.pb file")
    ap.add_argument("--plane", default="TPU",
                    help="substring of the plane name (default: TPU)")
    ap.add_argument("--line", default="", help="substring of line names")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--list", action="store_true",
                    help="just list plane/line names and event counts")
    args = ap.parse_args()

    pb = find_xplane(args.path)
    planes = parse_xspace(pb)
    if args.list:
        for pl in planes:
            n_ev = sum(len(ln["events"]) for ln in pl["lines"])
            print(f"plane {pl['name']!r}: {len(pl['lines'])} lines, "
                  f"{n_ev} events")
            for ln in pl["lines"]:
                print(f"  line {ln['display_name'] or ln['name']!r}: "
                      f"{len(ln['events'])} events")
        return

    for pl in planes:
        if args.plane not in pl["name"]:
            continue
        print(f"=== plane {pl['name']} ===")
        for lname, rows in plane_report(pl, args.line, args.top).items():
            total = sum(r[1] for r in rows)
            print(f"--- line {lname} (top-{args.top} sum {total:.3f} ms)")
            for name, ms, count in rows:
                print(f"  {ms:10.3f} ms  x{count:<6d} {name[:90]}")


if __name__ == "__main__":
    main()
