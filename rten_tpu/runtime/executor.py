"""Graph executor: lowers a Graph IR to XLA via whole-graph jit tracing,
with an eager interpreter for profiling and data-dependent ops.

Re-imagining of the reference's interpreter loop (``Graph::run_plan``,
``src/graph.rs:797-1073``) for XLA's compilation model:

* The topo plan is *traced once* into a single jitted computation per
  (input-signature, output-set) key — the analog of the reference's
  ``CachedPlan`` (``src/graph.rs:353-397``), with XLA taking over
  scheduling, fusion, buffer reuse and in-place decisions (donation).
* Static values (constants and anything computed only from them or from
  shapes) flow through tracing as numpy arrays — shape-computation
  subgraphs (Shape→Gather→Concat→Reshape chains) fold away at trace
  time, which is the reference's constant-propagation pass
  (``src/optimize.rs:301-327``) done lazily.
* Ops whose *output shape* depends on input values (NonZero, NMS) cannot
  live under jit; the executor detects them and runs the graph eagerly.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ir.graph import ConstantNode, Graph, OperatorNode
from ..ops.registry import OpError, ensure_registered, get_op
from .timing import RunTiming, Timer


class StaticRequired(RuntimeError):
    """An operand that must be compile-time static was a traced value."""


class JitUnsupported(RuntimeError):
    """Graph contains ops that cannot be traced (data-dependent shapes)."""


@dataclass
class RunOptions:
    """Analog of the reference ``RunOptions`` (``src/graph.rs:466-483``)."""
    timing: bool = False
    timing_sort: str = "time"
    timing_by_shape: bool = False
    verbose: bool = False
    eager: bool = False
    seed: int = 0


class _Ctx:
    """Per-op lowering context handed to op functions."""

    __slots__ = ("eager", "n_outputs", "subgraphs", "_rng_next", "_subgraph_runner")

    def __init__(self, eager, n_outputs, subgraphs, rng_next, subgraph_runner):
        self.eager = eager
        self.n_outputs = n_outputs
        self.subgraphs = subgraphs
        self._rng_next = rng_next
        self._subgraph_runner = subgraph_runner

    def rng(self):
        return self._rng_next()

    def subgraph_fn(self, key):
        sub = self.subgraphs.get(key)
        if sub is None:
            return None
        runner = self._subgraph_runner
        return lambda: runner(sub)


def _is_static(v):
    return isinstance(v, (np.ndarray, np.generic))


def _to_np(v):
    if _is_static(v):
        return np.asarray(v)
    return np.asarray(jax.device_get(v))


class GraphExecutor:
    def __init__(self, graph: Graph):
        ensure_registered()
        self.graph = graph
        self._jit_cache: dict = {}
        self._jit_unsupported: dict = {}
        self._const_device: dict = {}   # node_id -> device-resident array

    # ------------------------------------------------------------------
    # Plan evaluation (shared by trace and eager paths)
    # ------------------------------------------------------------------

    def _eval_plan(self, graph: Graph, env: dict, plan, *, eager: bool,
                   rng_next, timing: Optional[RunTiming] = None,
                   verbose=False, fold_static=True):
        """Evaluate operator nodes of ``plan`` over ``env`` (node id →
        value). Static numpy values propagate through ops whose inputs are
        all static; traced values produce traced outputs."""
        for op_id in plan:
            node = graph.nodes[op_id]
            op: OperatorNode = node.data
            spec = get_op(op.op_type)
            args = [env.get(i) if i is not None else None for i in op.inputs]

            def subgraph_runner(sub: Graph, outer_env=env, outer_graph=graph):
                sub_env = {}
                for cap in sub.captures:
                    cap_name = sub.nodes[cap].name
                    outer_id = (outer_graph.node_id(cap_name)
                                if cap_name else None)
                    if outer_id is None or outer_id not in outer_env:
                        raise OpError(op.op_type,
                                      f"unresolved capture {cap_name!r}")
                    sub_env[cap] = outer_env[outer_id]
                for i, n in enumerate(sub.nodes):
                    if isinstance(n.data, ConstantNode):
                        sub_env[i] = n.data.array
                sub_plan = sub.plan(list(sub_env.keys()), sub.outputs)
                self._eval_plan(sub, sub_env, sub_plan, eager=eager,
                                rng_next=rng_next, fold_static=fold_static)
                outs = tuple(sub_env[o] for o in sub.outputs)
                return outs[0] if len(outs) == 1 else outs

            ctx = _Ctx(eager, len(op.outputs), op.subgraphs, rng_next,
                       subgraph_runner)

            required = [a for a in args if a is not None]
            all_static = all(_is_static(a) for a in required)

            if spec.data_dependent:
                if not (eager or all_static):
                    raise JitUnsupported(
                        f"op {op.op_type} (node {op_id}) has value-dependent "
                        "output shapes and cannot be jitted")
                args = [None if a is None else _to_np(a) for a in args]
            else:
                for i in spec.static:
                    if i < len(args) and args[i] is not None \
                            and not _is_static(args[i]):
                        if eager:
                            args[i] = _to_np(args[i])
                        else:
                            raise StaticRequired(
                                f"op {op.op_type} (node {op_id}) requires "
                                f"static operand {i}")

            fold = (fold_static and all_static and not spec.random
                    and not spec.has_subgraph)

            t0 = time.perf_counter() if timing else None
            if fold and not spec.data_dependent:
                # Host fast path: fold-common ops evaluate in pure numpy —
                # no device dispatch (critical when the accelerator is
                # remote: per-op link latency turns load-time folding of
                # weight chains into minutes).
                from ..ops.numpy_eval import try_numpy_eval
                handled, np_result = try_numpy_eval(op.op_type, op.attrs,
                                                    args)
                if handled:
                    result = np_result
                    if not isinstance(result, tuple):
                        result = (result,)
                    for out_id, value in zip(op.outputs, result):
                        if out_id is not None:
                            env[out_id] = value
                    if timing is not None:
                        timing.add(op.op_type, time.perf_counter() - t0,
                                   tuple(tuple(a.shape) for a in required))
                    continue
            if fold and not spec.data_dependent:
                # All-static op: evaluate outside any active trace and keep
                # the result static (numpy) so downstream shape-operands
                # fold too. This is lazy constant propagation.
                def conv_args():
                    # jnp conversion must happen inside the active context:
                    # under an outer trace it stages to a tracer.
                    return [None if a is None else jnp.asarray(a)
                            if i not in spec.static else np.asarray(a)
                            for i, a in enumerate(args)]
                try:
                    with jax.ensure_compile_time_eval():
                        result = spec.fn(ctx, op.attrs, *conv_args())
                    result = jax.tree_util.tree_map(_to_np, result)
                except NotImplementedError:
                    # Pallas-backed ops have no eval rule under compile-time
                    # eval: execute normally instead (result is simply not
                    # static — fine unless it feeds a shape operand).
                    result = spec.fn(ctx, op.attrs, *conv_args())
            else:
                if not spec.data_dependent:
                    # Lowerings expect jax arrays for non-static operands
                    # (e.g. `.at[]` updates); static operands stay numpy.
                    args = [a if a is None or i in spec.static
                            else jnp.asarray(a)
                            for i, a in enumerate(args)]
                result = spec.fn(ctx, op.attrs, *args)
            if timing is not None:
                jax.tree_util.tree_map(
                    lambda v: v.block_until_ready()
                    if hasattr(v, "block_until_ready") else v, result)
                timing.add(op.op_type, time.perf_counter() - t0,
                           tuple(tuple(a.shape) for a in required))
            if verbose:
                shapes = [None if a is None else tuple(a.shape) for a in args]
                print(f"[{op_id}] {op.op_type} {node.name or ''} "
                      f"inputs={shapes}")

            if not isinstance(result, tuple):
                result = (result,)
            if len(result) < len(op.outputs):
                raise OpError(op.op_type,
                              f"produced {len(result)} outputs, "
                              f"expected {len(op.outputs)}")
            for out_id, value in zip(op.outputs, result):
                if out_id is not None:
                    env[out_id] = value
        return env

    # ------------------------------------------------------------------
    # Eager path
    # ------------------------------------------------------------------

    def run_eager(self, inputs: dict, output_ids=None,
                  options: Optional[RunOptions] = None):
        options = options or RunOptions()
        graph = self.graph
        output_ids = list(output_ids) if output_ids is not None else graph.outputs
        env = dict(inputs)
        for i, n in enumerate(graph.nodes):
            if isinstance(n.data, ConstantNode):
                env[i] = n.data.array
        plan = graph.plan(list(inputs.keys()), output_ids)
        timing = RunTiming() if options.timing else None
        key_state = {"key": jax.random.PRNGKey(options.seed)}

        def rng_next():
            key_state["key"], sub = jax.random.split(key_state["key"])
            return sub

        with Timer() as t:
            self._eval_plan(graph, env, plan, eager=True, rng_next=rng_next,
                            timing=timing, verbose=options.verbose)
        if timing is not None:
            timing.total = t.elapsed
            print(timing.summary(options.timing_sort, options.timing_by_shape))
        return [env[o] for o in output_ids]

    # ------------------------------------------------------------------
    # Jit path
    # ------------------------------------------------------------------

    def _trace_fn(self, input_ids, output_ids, const_ids, has_random):
        graph = self.graph

        def fn(input_arrays, const_arrays, key):
            env = {}
            for node_id, arr in zip(input_ids, input_arrays):
                env[node_id] = arr
            # All constants enter as static numpy (so shape-operand chains
            # fold); large ones are then replaced by traced jit arguments so
            # weights are not baked into the compiled program.
            for node_id, node in enumerate(graph.nodes):
                if isinstance(node.data, ConstantNode):
                    env[node_id] = node.data.array
            for node_id, arr in zip(const_ids, const_arrays):
                env[node_id] = arr
            key_state = {"key": key}

            def rng_next():
                if key is None:
                    raise OpError("Random", "graph has random ops but no key")
                key_state["key"], sub = jax.random.split(key_state["key"])
                return sub

            plan = graph.plan(input_ids, output_ids)
            self._eval_plan(graph, env, plan, eager=False, rng_next=rng_next)
            outs = []
            for o in output_ids:
                v = env[o]
                outs.append(jnp.asarray(v) if _is_static(v) else v)
            return tuple(outs)

        return fn

    def _const_split(self, plan):
        """Partition constants used by the plan: large arrays become jit
        arguments (kept on device, not baked into the program); small ones
        stay embedded so static folding can use their values."""
        graph = self.graph
        used = set()
        stack = list(plan)
        while stack:
            op_id = stack.pop()
            op = graph.nodes[op_id].data
            for i in op.inputs:
                if i is not None and isinstance(graph.nodes[i].data, ConstantNode):
                    used.add(i)
            for sub in op.subgraphs.values():
                for cap in sub.captures:
                    name = sub.nodes[cap].name
                    outer = graph.node_id(name) if name else None
                    if outer is not None and isinstance(
                            graph.nodes[outer].data, ConstantNode):
                        used.add(outer)
        # Static-required operands must stay embedded regardless of size.
        static_only = set()
        for op_id in plan:
            op = graph.nodes[op_id].data
            spec = get_op(op.op_type)
            for i in spec.static:
                if i < len(op.inputs) and op.inputs[i] is not None:
                    static_only.add(op.inputs[i])
        arg_consts = sorted(
            i for i in used
            if i not in static_only and graph.nodes[i].data.array.size > 64)
        return arg_consts

    def build_jitted(self, input_ids, input_specs, output_ids, donate=()):
        """Compile (or fetch cached) jitted callable for this signature."""
        key = (tuple(input_ids), tuple(input_specs), tuple(output_ids),
               tuple(donate))
        cached = self._jit_cache.get(key)
        if cached is not None:
            return cached
        plan = self.graph.plan(input_ids, output_ids)
        has_random = any(get_op(self.graph.nodes[i].data.op_type).random
                         for i in plan)
        const_ids = self._const_split(plan)
        fn = self._trace_fn(list(input_ids), list(output_ids), const_ids,
                            has_random)
        jitted = jax.jit(fn, donate_argnums=(0,) if donate else ())
        entry = (jitted, const_ids, has_random)
        self._jit_cache[key] = entry
        return entry

    def run_jit(self, inputs: dict, output_ids=None,
                options: Optional[RunOptions] = None):
        options = options or RunOptions()
        graph = self.graph
        output_ids = list(output_ids) if output_ids is not None else graph.outputs
        input_ids = sorted(inputs.keys())
        input_arrays = [inputs[i] for i in input_ids]
        input_specs = [(tuple(np.shape(a)), str(jnp.asarray(a).dtype) if not
                        hasattr(a, "dtype") else str(a.dtype))
                       for a in input_arrays]
        jitted, const_ids, has_random = self.build_jitted(
            input_ids, input_specs, output_ids)
        const_arrays = [self._device_const(i) for i in const_ids]
        key = jax.random.PRNGKey(options.seed) if has_random else None
        return list(jitted(tuple(input_arrays), tuple(const_arrays), key))

    def _device_const(self, node_id):
        """Device-RESIDENT constant for jit-argument weights. Passing the
        host numpy array re-uploads every weight on every call — through
        a remote dispatch link that was ~1.3 s of fixed cost per
        ResNet-50 run (round-4 finding: batch-8 vision throughput was
        upload-bound, not compute-bound). The device copy is made once
        and pinned for the executor's lifetime, the analog of the
        reference keeping weights mmapped (src/constant_storage.rs)."""
        arr = self._const_device.get(node_id)
        if arr is None:
            arr = jnp.asarray(self.graph.nodes[node_id].data.array)
            self._const_device[node_id] = arr
        return arr

    def run(self, inputs: dict, output_ids=None,
            options: Optional[RunOptions] = None):
        options = options or RunOptions()
        if options.eager or options.timing:
            return self.run_eager(inputs, output_ids, options)
        key = ("supported", tuple(sorted(inputs.keys())),
               tuple(output_ids) if output_ids else None)
        if self._jit_unsupported.get(key):
            return self.run_segmented(inputs, output_ids, options)
        try:
            return self.run_jit(inputs, output_ids, options)
        except (JitUnsupported, StaticRequired):
            self._jit_unsupported[key] = True
            return self.run_segmented(inputs, output_ids, options)

    # ------------------------------------------------------------------
    # Segmented execution (host-op islands inside jitted segments)
    # ------------------------------------------------------------------

    def _host_ops(self, plan):
        """Ops that cannot live under jit: value-dependent output shapes,
        or static-required operands that are not constants (after
        load-time folding, any remaining one is genuinely dynamic)."""
        graph = self.graph
        host = set()
        for op_id in plan:
            op = graph.nodes[op_id].data
            spec = get_op(op.op_type)
            if spec.data_dependent or spec.has_subgraph:
                host.add(op_id)
                continue
            for i in spec.static:
                if i < len(op.inputs) and op.inputs[i] is not None and \
                        not isinstance(graph.nodes[op.inputs[i]].data,
                                       ConstantNode):
                    host.add(op_id)
                    break
        return host

    def run_segmented(self, inputs: dict, output_ids=None,
                      options: Optional[RunOptions] = None):
        """Execute the plan as jitted segments separated by host ops —
        a graph with one NonZero/NMS keeps everything else compiled."""
        options = options or RunOptions()
        graph = self.graph
        output_ids = list(output_ids) if output_ids is not None \
            else graph.outputs
        plan = graph.plan(list(inputs.keys()), output_ids)
        host_ops = self._host_ops(plan)

        segments: list[tuple[str, list[int]]] = []
        for op_id in plan:
            kind = "host" if op_id in host_ops else "jit"
            if segments and segments[-1][0] == kind:
                segments[-1][1].append(op_id)
            else:
                segments.append((kind, [op_id]))

        env = dict(inputs)
        for i, n in enumerate(graph.nodes):
            if isinstance(n.data, ConstantNode):
                env[i] = n.data.array
        key_state = {"key": jax.random.PRNGKey(options.seed)}

        def rng_next():
            key_state["key"], sub = jax.random.split(key_state["key"])
            return sub

        # Which segment consumes each value (for tight segment outputs).
        op_segment = {}
        for seg_idx, (_, seg_plan) in enumerate(segments):
            for op_id in seg_plan:
                op_segment[op_id] = seg_idx
        consumers: dict[int, set] = {}
        for op_id in plan:
            for i in graph.nodes[op_id].data.inputs:
                if i is not None:
                    consumers.setdefault(i, set()).add(op_segment[op_id])

        for seg_idx, (kind, seg_plan) in enumerate(segments):
            if kind == "host":
                self._eval_plan(graph, env, seg_plan, eager=True,
                                rng_next=rng_next,
                                verbose=options.verbose)
                continue
            # Segment boundary values: inputs = consumed but not produced
            # inside; outputs = produced and consumed later (or final).
            produced = set()
            for op_id in seg_plan:
                produced.update(o for o in graph.nodes[op_id].data.outputs
                                if o is not None)
            seg_inputs = sorted({
                i for op_id in seg_plan
                for i in graph.nodes[op_id].data.inputs
                if i is not None and i not in produced
                and not isinstance(graph.nodes[i].data, ConstantNode)})
            seg_outputs = sorted(
                o for o in produced
                if o in output_ids
                or any(s > seg_idx for s in consumers.get(o, ())))

            cache_key = ("seg", seg_idx, tuple(seg_inputs),
                         tuple(seg_outputs),
                         tuple((tuple(np.shape(env[i])),
                                str(np.asarray(env[i]).dtype) if _is_static(env[i])
                                else str(env[i].dtype))
                               for i in seg_inputs))
            entry = self._jit_cache.get(cache_key)
            if entry is None:
                const_ids = self._const_split(seg_plan)

                def seg_fn(in_arrays, const_arrays, key,
                           _plan=tuple(seg_plan), _inputs=tuple(seg_inputs),
                           _outputs=tuple(seg_outputs),
                           _consts=tuple(const_ids)):
                    local_env = {}
                    for node_id, node in enumerate(graph.nodes):
                        if isinstance(node.data, ConstantNode):
                            local_env[node_id] = node.data.array
                    for node_id, arr in zip(_consts, const_arrays):
                        local_env[node_id] = arr
                    for node_id, arr in zip(_inputs, in_arrays):
                        local_env[node_id] = arr
                    ks = {"key": key}

                    def seg_rng():
                        ks["key"], sub = jax.random.split(ks["key"])
                        return sub

                    self._eval_plan(graph, local_env, list(_plan),
                                    eager=False, rng_next=seg_rng)
                    return tuple(jnp.asarray(local_env[o])
                                 for o in _outputs)

                entry = (jax.jit(seg_fn), const_ids)
                self._jit_cache[cache_key] = entry
            jitted, const_ids = entry
            const_arrays = [graph.nodes[i].data.array for i in const_ids]
            results = jitted(tuple(env[i] for i in seg_inputs),
                             tuple(const_arrays), rng_next())
            for out_id, value in zip(seg_outputs, results):
                env[out_id] = value
        return [env[o] for o in output_ids]

    # ------------------------------------------------------------------
    # Partial evaluation
    # ------------------------------------------------------------------

    def partial_run(self, inputs: dict, output_ids=None):
        """Evaluate every op whose transitive deps are available from
        ``inputs`` + constants; returns {node_id: value} for the deepest
        computed values on the paths to ``output_ids`` (the reference's
        ``Graph::partial_run``, ``src/graph.rs:1147-1234``)."""
        graph = self.graph
        output_ids = list(output_ids) if output_ids is not None else graph.outputs
        env = dict(inputs)
        for i, n in enumerate(graph.nodes):
            if isinstance(n.data, ConstantNode):
                env[i] = n.data.array

        resolved: dict[int, bool] = {}

        def computable(value_id) -> bool:
            if value_id in env:
                return True
            if value_id in resolved:
                return resolved[value_id]
            op_id = graph.producer_of(value_id)
            if op_id is None:
                resolved[value_id] = False
                return False
            op = graph.nodes[op_id].data
            # Nondeterministic ops must not be pre-evaluated (the reference
            # gates constant propagation on Operator::is_deterministic).
            if get_op(op.op_type).random:
                resolved[value_id] = False
                return False
            ok = all(computable(i) for i in op.inputs if i is not None)
            for out in op.outputs:
                if out is not None:
                    resolved[out] = ok
            return resolved.get(value_id, False)

        # Frontier: deepest computable values feeding each output.
        frontier: set[int] = set()
        seen: set[int] = set()

        def walk(value_id):
            if value_id in seen:
                return
            seen.add(value_id)
            if computable(value_id):
                frontier.add(value_id)
                return
            op_id = graph.producer_of(value_id)
            if op_id is None:
                return
            for i in graph.nodes[op_id].data.inputs:
                if i is not None:
                    walk(i)

        for o in output_ids:
            walk(o)

        target = [f for f in frontier if f not in env]
        if target:
            plan = graph.plan(list(env.keys()), target)
            key_state = {"key": jax.random.PRNGKey(0)}

            def rng_next():
                key_state["key"], sub = jax.random.split(key_state["key"])
                return sub

            self._eval_plan(graph, env, plan, eager=True, rng_next=rng_next)
        return {f: env[f] for f in frontier}
