"""Device-side tape representation.

The reference packs clauses into ``uint64`` words in a CUDA buffer
(``/root/reference/src/tape.cpp:223-227``).  The TPU-native layout is a
struct-of-arrays pytree: int32 index planes plus a float32 immediate vector.
Keeping ``imms`` a separate leaf makes the tape constants a first-class
differentiable parameter vector (``jax.grad`` w.r.t. ``tape.imms`` gives
d(image)/d(constants) — the differentiable-renderer path).

Static metadata (slot count, axis slots, result slot) rides as pytree
aux_data so jit specializes on it, while the clause arrays stay traced —
one compiled executable serves every shape whose tape fits the same padded
bucket.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..tape.tape import Tape


def _round_bucket(n: int, buckets=(256, 512, 1024, 2048, 4096, 8192, 16384)) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"tape too long: {n}")


@jax.tree_util.register_pytree_node_class
class TapeData:
    """Pytree of device tape arrays + static metadata.

    ``packed`` is ops/out/lhs/rhs packed 8 bits each into one int32 per
    clause (op | out<<8 | lhs<<16 | rhs<<24) — the layout the Pallas kernels
    read from SMEM as a single scalar word, mirroring the byte-packing of
    /root/reference/inc/clause.hpp.  ``imms`` stays a separate float32 leaf.
    """

    def __init__(self, packed: jnp.ndarray, imms: jnp.ndarray,
                 runs: jnp.ndarray,
                 length: int, num_slots: int,
                 axis_slots: Tuple[int, int, int], result_slot: int,
                 num_choices: int, ops_present: Tuple[int, ...] = (),
                 num_runs: int = 0):
        self.packed = packed
        self.imms = imms
        # full-tape opcode runs, packed op | count<<8 (see the opruns
        # scheduling pass in tape/tape.py); used for run-level dispatch
        self.runs = runs
        self.num_runs = int(num_runs)
        self.length = int(length)
        self.num_slots = int(num_slots)
        self.axis_slots = tuple(int(a) for a in axis_slots)
        self.result_slot = int(result_slot)
        self.num_choices = int(num_choices)
        # static: sorted GPU opcodes appearing in the tape; drives
        # branch-list specialization in the Pallas kernels
        self.ops_present = tuple(int(o) for o in ops_present)

    # -- pytree protocol ------------------------------------------------------
    def tree_flatten(self):
        return ((self.packed, self.imms, self.runs),
                (self.length, self.num_slots, self.axis_slots,
                 self.result_slot, self.num_choices, self.ops_present,
                 self.num_runs))

    @classmethod
    def tree_unflatten(cls, aux, children):
        packed, imms, runs = children
        (length, num_slots, axis_slots, result_slot, num_choices,
         ops_present, num_runs) = aux
        return cls(packed, imms, runs, length, num_slots, axis_slots,
                   result_slot, num_choices, ops_present, num_runs)

    # -- constructors ----------------------------------------------------------
    @classmethod
    def from_tape(cls, tape: Tape, pad_to: int = None) -> "TapeData":
        n = tape.length
        cap = pad_to if pad_to is not None else _round_bucket(n + 1)
        if n > cap:
            raise ValueError(f"tape length {n} exceeds capacity {cap}")
        packed = np.zeros(cap, dtype=np.int32)
        imms = np.zeros(cap, dtype=np.float32)
        word = (tape.ops.astype(np.uint32)
                | (tape.outs.astype(np.uint32) << 8)
                | (tape.lhss.astype(np.uint32) << 16)
                | (tape.rhss.astype(np.uint32) << 24))
        packed[:n] = word.astype(np.int32)
        imms[:n] = tape.imms
        # full-tape opcode runs (op | count << 8)
        ops = tape.ops
        bounds = np.flatnonzero(np.diff(ops)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [n]])
        rn = starts.shape[0]
        runs = np.zeros(cap, dtype=np.int32)
        runs[:rn] = (ops[starts].astype(np.int64)
                     | ((ends - starts).astype(np.int64) << 8)).astype(np.int32)
        # ops ordered by descending clause count: the kernels' lax.switch
        # chains test branches in this order, so hot ops dispatch first
        counts = np.bincount(ops, minlength=32)
        by_freq = np.argsort(-counts, kind="stable")
        ops_present = tuple(int(o) for o in by_freq if counts[o] > 0)
        return cls(jnp.asarray(packed), jnp.asarray(imms), jnp.asarray(runs),
                   length=n, num_slots=tape.num_slots,
                   axis_slots=tape.axis_slots,
                   result_slot=tape.result_slot,
                   num_choices=tape.num_choices,
                   ops_present=ops_present,
                   num_runs=rn)

    @property
    def capacity(self) -> int:
        return int(self.packed.shape[0])

    def replace_imms(self, imms) -> "TapeData":
        """Rebind the differentiable constant plane (e.g. after a
        gradient-descent step on d(image)/d(imms))."""
        return TapeData(self.packed, imms, self.runs, self.length,
                        self.num_slots, self.axis_slots, self.result_slot,
                        self.num_choices, self.ops_present, self.num_runs)


def _serialize_aux(aux) -> bytes:
    import json
    (length, num_slots, axis_slots, result_slot, num_choices,
     ops_present, num_runs) = aux
    return json.dumps([length, num_slots, list(axis_slots), result_slot,
                       num_choices, list(ops_present), num_runs]).encode()


def _deserialize_aux(data: bytes):
    import json
    (length, num_slots, axis_slots, result_slot, num_choices,
     ops_present, num_runs) = json.loads(data)
    return (length, num_slots, tuple(axis_slots), result_slot,
            num_choices, tuple(ops_present), num_runs)


try:
    # lets jax.export artifacts (utils/compcache.cached_lowering) take a
    # TapeData pytree as a runtime argument — the interp pipeline's tape
    # planes stay inputs, so one persisted lowering serves every tape
    # sharing the padded bucket + static metadata
    jax.export.register_pytree_node_serialization(
        TapeData, serialized_name="mpr_tpu.ops.tape_data.TapeData",
        serialize_auxdata=_serialize_aux,
        deserialize_auxdata=_deserialize_aux)
except AttributeError:                       # older jax: no export API
    pass


def unpack_fields(word):
    """Split a packed int32 clause into (op, out, lhs, rhs) scalars/arrays."""
    op = word & 0xFF
    out = (word >> 8) & 0xFF
    lhs = (word >> 16) & 0xFF
    rhs = (word >> 24) & 0xFF
    return op, out, lhs, rhs
