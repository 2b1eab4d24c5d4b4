"""Compare two bench artifacts (BENCH_r*.json / bench stdout captures).

Usage: python tools/bench_compare.py OLD.json NEW.json

Prints per-metric ratios plus the tunnel_rpc_ms congestion sentinel of
each run so a throughput delta can be read against tunnel weather
(cross-run swings of 3-5x have been measured; PERFORMANCE.md rule 9).
Accepts either a JSON-lines file (one {"metric": ...} per line) or a
JSON list.
"""

import json
import sys


def load(path):
    """Accepts a driver artifact (BENCH_r*.json: dict with a 'parsed'
    list and/or a 'tail' holding the JSON lines), a JSON list, or a raw
    JSON-lines capture of bench stdout."""
    out = {}
    with open(path) as f:
        text = f.read().strip()
    rows = []
    if text.startswith("{") and '"metric"' not in text.splitlines()[0]:
        doc = json.loads(text)
        for ln in doc.get("tail", "").splitlines():
            ln = ln.strip()
            if ln.startswith("{") and '"metric"' in ln:
                rows.append(json.loads(ln))
        parsed = doc.get("parsed")
        if isinstance(parsed, dict):
            rows.append(parsed)
        elif parsed:
            rows.extend(parsed)
    elif text.startswith("["):
        rows = json.loads(text)
    else:
        rows = [json.loads(ln) for ln in text.splitlines() if ln.strip().startswith("{")]
    for r in rows:
        out[r["metric"]] = r
    return out


def main(old_path, new_path):
    old, new = load(old_path), load(new_path)
    rpc_o = old.get("tunnel_rpc_ms", {}).get("value")
    rpc_n = new.get("tunnel_rpc_ms", {}).get("value")
    print("tunnel_rpc_ms: old=%s new=%s (healthy ~26 on TPU)" % (rpc_o, rpc_n))
    keys = [k for k in new if k != "tunnel_rpc_ms"]
    width = max((len(k) for k in keys), default=10)
    for k in keys:
        nv = new[k]["value"]
        if k in old:
            ov = old[k]["value"]
            ratio = nv / ov if ov else float("inf")
            print("%-*s  %14.1f -> %14.1f   x%.2f" % (width, k, ov, nv, ratio))
        else:
            print("%-*s  %14s -> %14.1f   (new)" % (width, k, "-", nv))
    for k in old:
        if k not in new and k != "tunnel_rpc_ms":
            print("%-*s  dropped (was %.1f)" % (width, k, old[k]["value"]))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
