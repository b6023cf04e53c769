#!/usr/bin/env python3
"""Merge per-invocation ScaleBench JSONs into one SCALE_r{N}.json.

Usage: python3 tools/merge_scale.py OUT.json IN1.json IN2.json ...

Why split invocations at all: the sf100 rehearsal runs each heavy
family (and each heavy graph query) as its OWN ScaleBench invocation so
a casualty (OOM/ENOSPC on a 1000x corpus) costs only its own
measurement, not the whole artifact. Cross-SF ratios stay valid because
ScaleBench measures each query's SFs back-to-back within one
invocation — the same-window rule — and this merge only unions the
family maps (summing subset_total and concatenating query maps when two
invocations split one family).

Builder-side tooling only — the engine library has no Python.
"""
import json
import sys


def main(out: str, ins: list[str]) -> None:
    merged: dict = None
    sfs: list[str] = []

    def normalize(d: dict) -> dict:
        # JSONs written by pre-hardening ScaleBench binaries render a
        # failed child query as wall -1.0 (and a negative ratio off
        # it); the current binary emits "failed" — normalize old files
        # to the new form so the merged artifact is uniform
        for body in d.get("families", {}).values():
            for qv in body.get("queries", {}).values():
                for k in list(qv):
                    if isinstance(qv[k], (int, float)) and qv[k] < 0:
                        if k.startswith("ratio_"):
                            del qv[k]
                        else:
                            qv[k] = "failed"
            # pre-r12 ScaleBench rendered a DEAD child (no bench output
            # at all) as an empty per-query map while marking the
            # family's subset_total "failed" — lift that family-level
            # marker back onto each attempted query so the merge can't
            # silently turn "attempted and died" into "never attempted"
            for sf, tot in body.get("subset_total", {}).items():
                if tot == "failed":
                    for qv in body.get("queries", {}).values():
                        qv.setdefault(sf, "failed")
        return d

    for p in ins:
        d = normalize(json.load(open(p)))
        for sf in d.get("sfs", []):
            if sf not in sfs:
                sfs.append(sf)
        if merged is None:
            merged = d
            continue
        for fam, body in d["families"].items():
            if fam not in merged["families"]:
                merged["families"][fam] = body
                continue
            tgt = merged["families"][fam]
            # DEEP-merge per query: two invocations may carry the SAME
            # query at different SFs (e.g. the sf100 point measured in
            # its own isolated window after the ≤sf30 curve) — a dict
            # replace would silently drop the earlier SFs' walls.
            # Ratios stay as computed by their own invocation (they are
            # window-scoped); on a key conflict the later input wins.
            for q, qv in body["queries"].items():
                tgt["queries"].setdefault(q, {}).update(qv)
            # probes deep-merge the same way (counts are DATA
            # properties — identical across windows — so unioning SF
            # keys from different invocations is always valid); the
            # exactly_linear flag is recomputed over the merged map
            # below, so per-input flags are just unioned here
            for q, pv in body.get("linearity_probes", {}).items():
                tgt.setdefault("linearity_probes", {}) \
                    .setdefault(q, {}).update(pv)
            # configs agree per SF by construction (shared Cfg tables);
            # keep the union so every measured SF is documented
            tgt.setdefault("config", {}).update(body.get("config", {}))
    merged["sfs"] = sfs
    # Recompute subset_total from the MERGED query maps rather than
    # summing the inputs' totals: overlapping inputs (same family run
    # twice, or an output file accidentally passed as an input) would
    # silently double-count a summed total while queries.update() keeps
    # only one copy of each wall (ADVICE r11). An SF where every merged
    # query failed renders "failed"; an SF no query attempted is omitted.
    # Recompute exactly_linear across the MERGED probe map: a per-input
    # flag only covered that invocation's SFs. Counts are deterministic
    # data properties, so the cross-window check is exact. Factor table
    # mirrors graft.ScaleBench.sfFactors.
    factors = {"sf0.1": 1, "sf1": 10, "sf10": 100, "sf30": 300,
               "sf100": 1000}
    for body in merged["families"].values():
        for q, pv in body.get("linearity_probes", {}).items():
            # SF keys the factor table doesn't know CANNOT be silently
            # skipped (ADVICE r12: a future sf300 point would be
            # ignored and the flag would read true while an unchecked
            # point is nonlinear) — an unknown key is a hard error so
            # whoever adds the SF also extends this table (and
            # graft.ScaleBench.sfFactors, which it mirrors)
            unknown = [sf for sf in pv
                       if sf.startswith("sf") and sf not in factors]
            if unknown:
                raise SystemExit(
                    f"merge_scale: probe '{q}' carries SF keys "
                    f"{unknown} absent from the factors table — extend "
                    "factors (and ScaleBench.sfFactors) before merging")
            pts = {sf: v for sf, v in pv.items() if sf in factors}
            if len(pts) >= 2:
                base_sf = min(pts, key=lambda s: factors[s])
                base = pts[base_sf]
                pv["exactly_linear"] = all(
                    v * factors[base_sf] == base * factors[sf]
                    for sf, v in pts.items())
            elif pts:
                # one point proves nothing about linearity — say so
                # instead of emitting a vacuous True (ADVICE r12)
                pv["exactly_linear"] = None
    for body in merged["families"].values():
        totals: dict = {}
        for sf in sfs:
            walls = [qv[sf] for qv in body.get("queries", {}).values()
                     if sf in qv]
            nums = [w for w in walls if isinstance(w, (int, float))]
            if nums:
                totals[sf] = round(sum(nums), 3)
            elif walls:
                totals[sf] = "failed"
        body["subset_total"] = totals
    merged["mode"] = (
        "sequential per-query seconds, per-family config, SFs "
        "back-to-back in one window; heavy families/queries run as "
        "separate invocations (tools/merge_scale.py) so an sf100 "
        "casualty is isolated")
    with open(out, "w") as f:
        json.dump(merged, f, indent=1)
        f.write("\n")
    print(f"merged {len(ins)} -> {out}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:])
