"""Shape-bucketed lowering of pairwise contraction paths.

The general engine (round 1) emitted one ``jnp.einsum`` + rescale pair
per path step, so a 300-node inhomogeneous network cost ~300 HLO
contractions and ~4.5 s of cold graph->HLO time (~15 ms/step).  But real
paths are highly regular: opt_einsum's greedy path over a long chain is
one *level* of ~n/2 independent identical-signature pair contractions
followed by one ~n/2-step linear recurrence.  This pass recognizes those
two shapes in the step stream and lowers them to O(1) HLO each:

* **batch bucket** — a run of >= ``MIN_BUCKET`` consecutive mutually
  independent steps with the same canonical ``(step_str, shapes)``
  signature becomes ONE batched einsum (+ per-slice rescale); operand
  stacks are assembled host-side when the inputs are original operands,
  or by a single gather when they are slices of an earlier bucket.
* **scan bucket** — a run of >= ``MIN_BUCKET`` consecutive steps that
  each contract the previous step's output (the carry) with a fresh
  same-shape operand becomes ONE ``lax.scan`` whose body is a single
  einsum + rescale, with the log register carried through the scan.

Everything else stays a plain per-step einsum.  The split-format
invariant is untouched: every intermediate is rescaled exactly once, in
the same order, so values match the sequential numpy oracle to float
tolerance.  No counterpart in the reference (its engine is an
interpreted per-step loop, ``einsum.py:326-393``); this is the
compile-time analog of its path-cache amortization.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.stabilize import (
    dot_precision,
    stabilize,
    stabilize_batched,
)

from opt_einsum import get_symbol

MIN_BUCKET = 8


def _canon(step_str, swap=False):
    """Remap a 2-term step string onto canonical symbols in
    first-appearance order (opt_einsum's unbounded symbol range, so
    steps with > 52 distinct indices canonicalize instead of crashing),
    optionally swapping the two input terms first."""
    lhs, out = step_str.split("->")
    terms = lhs.split(",")
    if swap:
        terms = terms[::-1]
    mapping = {}
    res = []
    for ch in ",".join(terms) + "->" + out:
        if ch in ",->":
            res.append(ch)
            continue
        if ch not in mapping:
            mapping[ch] = get_symbol(len(mapping))
        res.append(mapping[ch])
    return "".join(res)


def _step_out_shape(step_str, in_shapes):
    dims = {}
    lhs, out = step_str.split("->")
    for term, shape in zip(lhs.split(","), in_shapes):
        for s, d in zip(term, shape):
            dims[s] = d
    return tuple(dims[s] for s in out)


def _classify(steps, n_operands, shapes):
    """Simulate the pop/append operand list, tagging each step with ids,
    shapes, and its bucketing signature."""
    ops = list(range(n_operands))
    shape_of = {i: tuple(shapes[i]) for i in range(n_operands)}
    nxt = n_operands
    records = []
    for inds, step_str in steps:
        in_ids = [ops.pop(i) for i in inds]
        in_shapes = [shape_of[i] for i in in_ids]
        out_shape = _step_out_shape(step_str, in_shapes)
        out_id = nxt
        nxt += 1
        shape_of[out_id] = out_shape
        ops.append(out_id)
        rec = {
            "in_ids": in_ids,
            "in_shapes": in_shapes,
            "out_id": out_id,
            "out_shape": out_shape,
            "step_str": step_str,
        }
        if len(in_ids) == 2:
            prev_out = out_id - 1
            if prev_out in in_ids and records:
                carry_pos = in_ids.index(prev_out)
                canon = _canon(step_str, swap=(carry_pos == 1))
                rec["dep_sig"] = (
                    canon,
                    in_shapes[carry_pos],
                    in_shapes[1 - carry_pos],
                )
                rec["carry_pos"] = carry_pos
            rec["indep_sig"] = (_canon(step_str), tuple(in_shapes))
        records.append(rec)
    return records, ops[0] if ops else None


def plan_program(steps, n_operands, shapes):
    """Group the step stream into (single | batch | scan) plan items.

    Returns ``(plan, result_id)`` or ``(None, None)`` when no bucket
    clears ``MIN_BUCKET`` (caller keeps the plain sequential program).
    """
    records, result_id = _classify(steps, n_operands, shapes)
    if not records:
        return None, None

    plan = []
    i = 0
    bucketed = False
    while i < len(records):
        rec = records[i]

        # Scan run: maximal chain of dep steps with one signature whose
        # carry shape is preserved (lax.scan needs a fixed-shape carry)
        sig = rec.get("dep_sig")
        if sig is not None and sig[1] == rec["out_shape"]:
            j = i
            while (
                j < len(records)
                and records[j].get("dep_sig") == sig
                and records[j]["out_shape"] == sig[1]
                and records[j]["in_ids"][records[j]["carry_pos"]]
                == records[j]["out_id"] - 1
            ):
                j += 1
            if j - i >= MIN_BUCKET:
                run = records[i:j]
                plan.append({
                    "kind": "scan",
                    "canon": sig[0],
                    "carry_id": run[0]["in_ids"][run[0]["carry_pos"]],
                    "xs_ids": [
                        r["in_ids"][1 - r["carry_pos"]] for r in run
                    ],
                    "out_id": run[-1]["out_id"],
                })
                bucketed = True
                i = j
                continue

        # Batch run: maximal independent steps with one signature
        sig = rec.get("indep_sig")
        if sig is not None:
            j = i
            outs = set()
            while j < len(records) and records[j].get("indep_sig") == sig:
                if any(x in outs for x in records[j]["in_ids"]):
                    break  # consumes an output of this very run
                outs.add(records[j]["out_id"])
                j += 1
            if j - i >= MIN_BUCKET:
                run = records[i:j]
                plan.append({
                    "kind": "batch",
                    "canon": sig[0],
                    "slot_ids": (
                        [r["in_ids"][0] for r in run],
                        [r["in_ids"][1] for r in run],
                    ),
                    "out_ids": [r["out_id"] for r in run],
                })
                bucketed = True
                i = j
                continue

        plan.append({
            "kind": "single",
            "in_ids": rec["in_ids"],
            "step_str": rec["step_str"],
            "out_id": rec["out_id"],
        })
        i += 1

    if not bucketed:
        return None, None
    return plan, result_id


def _batched_str(canon):
    """Prepend a fresh batch index to every term and the output."""
    i = 0
    while get_symbol(i) in canon:
        i += 1
    free = get_symbol(i)
    lhs, out = canon.split("->")
    return ",".join(free + t for t in lhs.split(",")) + "->" + free + out


def build_bucketed_runner(plan, result_id, n_operands, log_dtype_fn,
                          stack_fn):
    """Compile a plan into ``(pack, run)``.

    ``pack`` pre-stacks host-side every bucket slot whose ids are all
    original operands (so a 300-operand network reaches jit as a handful
    of arguments); ``run`` replays the plan with a registry that keeps
    bucket outputs as lazy stack slices, gathering them in one op when a
    later bucket consumes them.
    """
    # ---- decide the runtime argument layout ------------------------- #
    prestacked = []  # list of id-tuples (each becomes one stacked arg)
    in_prestack = set()

    def try_prestack(ids):
        if len(ids) >= MIN_BUCKET and all(i < n_operands for i in ids):
            prestacked.append(tuple(ids))
            in_prestack.update(ids)

    for item in plan:
        if item["kind"] == "batch":
            try_prestack(item["slot_ids"][0])
            try_prestack(item["slot_ids"][1])
        elif item["kind"] == "scan":
            try_prestack(item["xs_ids"])
    passthrough = [
        i for i in range(n_operands) if i not in in_prestack
    ]

    def pack(tensors):
        args = [jnp.asarray(tensors[i]) for i in passthrough]
        args.extend(
            stack_fn([tensors[i] for i in grp]) for grp in prestacked
        )
        return args

    def run(*args):
        log_dtype = log_dtype_fn(args)
        log_scale = jnp.zeros((), log_dtype)
        reg = {}      # id -> ("arr", x) | ("slice", sid, k)
        stacks = {}   # sid -> stacked array
        for pos, i in enumerate(passthrough):
            reg[i] = ("arr", args[pos])
        for g, grp in enumerate(prestacked):
            sid = ("pre", g)
            stacks[sid] = args[len(passthrough) + g]
            for k, i in enumerate(grp):
                reg[i] = ("slice", sid, k)

        def mat(entry):
            return (entry[1] if entry[0] == "arr"
                    else stacks[entry[1]][entry[2]])

        def gather(ids):
            ents = [reg.pop(i) for i in ids]
            sids = {e[1] for e in ents if e[0] == "slice"}
            if len(sids) == 1 and all(e[0] == "slice" for e in ents):
                s = stacks[next(iter(sids))]
                idxs = [e[2] for e in ents]
                if idxs == list(range(s.shape[0])):
                    return s
                return jnp.take(s, jnp.asarray(idxs), axis=0)
            return jnp.stack([mat(e) for e in ents])

        for sn, item in enumerate(plan):
            if item["kind"] == "single":
                tmp = [mat(reg.pop(i)) for i in item["in_ids"]]
                new = jnp.einsum(
                    item["step_str"], *tmp,
                    precision=dot_precision(*(t.dtype for t in tmp)),
                )
                new, log_scale = stabilize(new, log_scale)
                reg[item["out_id"]] = ("arr", new)
            elif item["kind"] == "batch":
                a = gather(item["slot_ids"][0])
                b = gather(item["slot_ids"][1])
                out = jnp.einsum(
                    _batched_str(item["canon"]), a, b,
                    precision=dot_precision(a.dtype, b.dtype),
                )
                k = out.shape[0]
                out, logs = stabilize_batched(
                    out, jnp.zeros((k,), log_dtype), 1
                )
                log_scale = log_scale + jnp.sum(logs)
                sid = ("bk", sn)
                stacks[sid] = out
                for pos, oid in enumerate(item["out_ids"]):
                    reg[oid] = ("slice", sid, pos)
            else:  # scan
                xs = gather(item["xs_ids"])
                c0 = mat(reg.pop(item["carry_id"]))
                prec = dot_precision(c0.dtype, xs.dtype)
                canon = item["canon"]

                def body(carry, x, canon=canon, prec=prec):
                    c, lg = carry
                    new = jnp.einsum(canon, c, x, precision=prec)
                    new, lg = stabilize(new, lg)
                    return (new, lg), None

                (c, lg), _ = jax.lax.scan(
                    body, (c0, jnp.zeros((), log_dtype)), xs
                )
                log_scale = log_scale + lg
                reg[item["out_id"]] = ("arr", c)

        return mat(reg[result_id]), log_scale

    return pack, run


def log_dtype_of(args):
    """The real floating dtype the log register should use."""
    dt = np.result_type(*(a.dtype for a in args))
    rdt = np.empty(0, dt).real.dtype
    if not np.issubdtype(rdt, np.floating):
        rdt = jnp.result_type(float)
    return rdt
