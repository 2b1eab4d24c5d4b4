"""General joint 2-D histogram lnPI(op_1, op_2).

Parity: /root/reference/moments/histogram/two_dim/joint_hist.pyx —
ragged per-op_1 entries assembled onto a padded rectangular surface with
-inf fill and per-row bounds indices.
"""

from __future__ import annotations

import copy
import json

import numpy as np

__all__ = ["joint_hist"]


class joint_hist(object):
    """Joint histogram assembled from per-op_1 lnPI(op_2) entries
    (joint_hist.pyx:22-301)."""

    class entry(object):
        """One lnPI(op_2) vector plus named property vectors
        (joint_hist.pyx:28-143)."""

        def __init__(self):
            self.clear_all()

        def clear_all(self):
            self.data = {}

        def clear_props(self):
            self.data["props"] = {}

        def set(self, lnpi, op_vals, name_val_dict):
            self.set_lnpi(lnpi, op_vals)
            for p in name_val_dict:
                self.set_prop(p, name_val_dict[p])

        def set_lnpi(self, lnpi, op_vals):
            assert len(op_vals) == len(lnpi), "Size mismatch between ln(PI) and order parameters"
            self.data["ln(PI)"] = np.array(lnpi, dtype=np.float64)
            assert np.all(sorted(op_vals) == np.asarray(op_vals)), "Order parameter values are not sorted"
            self.data["op_vals"] = np.array(op_vals, dtype=np.float64)
            if "props" in self.data:
                for x in self.data["props"]:
                    assert self._check_size(self.data["props"][x]), (
                        "Size of existing properties vectors is different from new ln(PI)"
                    )

        def set_prop(self, name, val):
            assert self._check_size(val), "Size of new property vector is different from existing ones"
            if "props" not in self.data:
                self.data["props"] = {}
            self.data["props"][name] = val

        def _check_size(self, x):
            if "ln(PI)" in self.data:
                ref_size = len(self.data["ln(PI)"])
            elif "op_vals" in self.data:
                ref_size = len(self.data["op_vals"])
            elif "props" in self.data and len(self.data["props"]) > 0:
                first = next(iter(self.data["props"]))
                ref_size = len(self.data["props"][first])
            else:
                ref_size = len(x)
            return len(x) == ref_size

    def __init__(self):
        self.clear()

    def clear(self):
        self.data = {}

    def add(self, op1, entry):
        """Add an entry at op_1 (joint_hist.pyx:163-178)."""
        if "entries" not in self.data:
            self.data["entries"] = {}
        self.data["entries"][op1] = copy.deepcopy(entry)

    def enter(self, op1, lnpi, op_vals, name_val_dict):
        """Add an entry from raw arrays (joint_hist.pyx:180-199)."""
        e = self.entry()
        e.set(lnpi, op_vals, name_val_dict)
        self.add(op1, e)

    def make(self):
        """Assemble the padded joint surface (joint_hist.pyx:201-247).

        Rows are sorted op_1 values; columns the union of op_2 values;
        missing cells are -inf in ln(PI) and 0 in properties; per-row
        [min_idx, max_idx] recorded in bounds_idx.
        """
        op1_vals = sorted(self.data["entries"])
        op2_vals = []
        for x in op1_vals:
            op2_vals = sorted(set(op2_vals) | set(self.data["entries"][x].data["op_vals"]))

        self.data["ln(PI)"] = np.full((len(op1_vals), len(op2_vals)), -np.inf, dtype=np.float64)
        self.data["op_1"] = np.array(op1_vals, dtype=np.float64)
        self.data["op_2"] = np.array(op2_vals, dtype=np.float64)
        self.data["bounds_idx"] = np.zeros((len(op1_vals), 2), dtype=np.int64)
        self.data["props"] = {}

        all_props = []
        for j, x in enumerate(op1_vals):
            op2 = self.data["entries"][x].data["op_vals"]
            lnpi = self.data["entries"][x].data["ln(PI)"]
            props = sorted(self.data["entries"][x].data["props"])
            min_idx, max_idx = np.inf, -np.inf
            for i in range(len(op2)):
                y = op2_vals.index(op2[i])
                self.data["ln(PI)"][j, y] = lnpi[i]
                min_idx = min(min_idx, y)
                max_idx = max(max_idx, y)
            self.data["bounds_idx"][j, :] = [min_idx, max_idx]
            if all_props:
                assert props == all_props, "Properties are not all the same, or some are missing"
            else:
                all_props = copy.copy(props)

        for prop in all_props:
            self.data["props"][prop] = np.zeros((len(op1_vals), len(op2_vals)), dtype=np.float64)
            for j, x in enumerate(op1_vals):
                op2 = self.data["entries"][x].data["op_vals"]
                for i in range(len(op2)):
                    y = op2_vals.index(op2[i])
                    self.data["props"][prop][j, y] = self.data["entries"][x].data["props"][prop][i]

    def to_json(self, fname):
        """JSON round-trip out (joint_hist.pyx:249-270)."""
        obj = {k: v for k, v in self.data.items() if k != "entries"}
        out = {
            "ln(PI)": np.asarray(obj["ln(PI)"]).tolist(),
            "op_1": np.asarray(obj["op_1"]).tolist(),
            "op_2": np.asarray(obj["op_2"]).tolist(),
            "bounds_idx": np.asarray(obj["bounds_idx"]).tolist(),
            "props": {p: np.asarray(v).tolist() for p, v in obj["props"].items()},
        }
        with open(fname, "w") as f:
            json.dump(out, f, indent=4, sort_keys=True)

    def from_json(self, fname):
        """JSON round-trip in (joint_hist.pyx:272-301)."""
        self.clear()
        with open(fname, "r") as f:
            raw = json.load(f)

        assert "ln(PI)" in raw, "Missing ln(PI) information"
        assert "op_1" in raw, "Missing op_1 information"
        assert "op_2" in raw, "Missing op_2 information"
        assert "bounds_idx" in raw, "Missing bounds information"
        assert "props" in raw, "Missing properties information"

        self.data["ln(PI)"] = np.array(raw["ln(PI)"], dtype=np.float64)
        self.data["op_1"] = np.array(raw["op_1"], dtype=np.float64)
        self.data["op_2"] = np.array(raw["op_2"], dtype=np.float64)
        self.data["bounds_idx"] = np.array(raw["bounds_idx"], dtype=np.float64)
        self.data["props"] = {p: np.array(v, dtype=np.float64) for p, v in raw["props"].items()}
