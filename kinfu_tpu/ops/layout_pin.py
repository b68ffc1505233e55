"""Layout anchoring for conditional-heavy TPU programs.

XLA assigns ONE layout per conditional result across all branches. The
fused volume switch (ops/fused_step.py) has branches that internally
transpose the volume (the +-y / +-x face sweeps), and XLA's layout
assignment picked the layout that makes a NEVER-EXECUTED branch's
transpose a free bitcast — taxing the hot +z branch (and the scan carry)
with full-volume {2,1,0}<->{2,0,1} relayout copies, ~7 ms/frame at 512^3
(r5 trace, BENCH 32.9 -> see PERF_NOTES).

`pin_natural` anchors values to the row-major Mosaic-default layout with
an ALIASED NO-OP pallas_call: TPU custom calls carry
operand_layout_constraints / result layouts, so every branch root becomes
a natural-layout custom-call result, the conditional adopts the natural
layout, and the relayout copies vanish (branches that genuinely transpose
pay only when executed). The kernel body is empty and inputs alias
outputs one-to-one, so no data moves and no VMEM is staged (ANY memory
space). Verified on hardware: /tmp-style probe r5 — identical results,
zero volume-sized copies in the compiled HLO.
"""

from __future__ import annotations

import jax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pin_natural(*arrays):
    """Identity on `arrays` with layouts pinned to Mosaic-default
    (row-major). No-op (passthrough) off-TPU — layouts only exist on the
    compiled TPU path, and interpret-mode aliasing semantics differ."""
    if jax.default_backend() != "tpu":
        return arrays

    def kern(*refs):
        pass

    n = len(arrays)
    return tuple(
        pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * n,
            out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * n,
            out_shape=[
                jax.ShapeDtypeStruct(a.shape, a.dtype) for a in arrays
            ],
            input_output_aliases={i: i for i in range(n)},
        )(*arrays)
    )
