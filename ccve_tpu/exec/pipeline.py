"""Chunk-at-a-time N-way join pipeline executor.

TPU-native re-design of the reference's recursive push-based executor
(`ExecutePipeline`, main.cpp:119-170; `FlushPipelineCache`,
main.cpp:172-191). The C++ version recurses per intermediate chunk on the
host call stack; under `jit` there is no data-dependent recursion, so the
executor becomes an explicit depth-first **work loop** (`lax.while_loop`)
over stacked per-level state:

 - `in_cols[l]`   — level l's current (dense) input chunk
 - scan cursors   — level l's ScanStructure (ops/hash_table.ScanState)
 - `cache_*[l]`   — level l's compactor cache (ops/compactor)

One loop iteration performs either one `Next` step at the current level
(match + slice + gather + compact + maybe descend / collect) or pops back
to the parent level when the level's scan is drained — exactly the
traversal order of the reference's recursion, with all shapes static and
`count` carried as traced scalars.

A whole batch of input chunks runs in ONE device dispatch via `lax.scan`
over the batch (`process_chunks`), so host↔device round-trips are
amortized; the DYNAMIC compaction strategy re-selects thresholds between
segments on the host (control/bandit.py) and feeds them in as traced
scalars — never a recompile.

Join semantics (and the oracle they must match) are documented in
exec/oracle.py.
"""

from __future__ import annotations

import time
from functools import partial
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ccve_tpu.config import CompactionStrategy, EngineConfig, PayloadMode
from ccve_tpu.control.bandit import CompactTuner
from ccve_tpu.core.chunk import Chunk, gather_rows, iota_sel
from ccve_tpu.ops import compactor as comp
from ccve_tpu.ops.hash_table import (
    CSRTable,
    LPTable,
    ScanState,
    csr_probe,
    lp_probe,
    scan_next,
)


class PipelineState(NamedTuple):
    """Device-resident state that persists across input chunks."""

    cache_cols: jax.Array  # int64[n_levels, W, block] compactor caches
    cache_count: jax.Array  # int32[n_levels]
    result_count: jax.Array  # int64 scalar: rows emitted by the collector
    result_rows: jax.Array  # int64[W, capacity] materialized results
    result_stored: jax.Array  # int64 scalar: rows actually stored (<= capacity)
    occupancy: jax.Array  # int64[n_levels, block+1]: ZebraProfiler-style
    #   histogram of emitted-chunk occupancy per level (profiler.h:178-237,
    #   keyed by live-row count; recorded on device, exported by the driver)
    level_steps: jax.Array  # int32[n_levels]: work-loop steps taken at each
    #   level — the device-side cost signal (each step is one fixed-shape op
    #   chain, so steps ∝ device time); feeds the on-device DYNAMIC tuner
    level_rows: jax.Array  # int32[n_levels]: live scan rows summed over the
    #   steps taken at each level (only maintained under DYNAMIC — a static
    #   run never reads it). rows / (block * steps) is the level's mean
    #   step occupancy: the phase-invariant efficiency signal the device
    #   tuner rewards (a raw 1/steps reward conflates the arm with the
    #   stream's load — a high-selectivity phase produces 10x the steps of
    #   a low one no matter the threshold). Wrap-safe: rewards use
    #   per-segment int32 deltas.


def _deepest_pending(sc_count: jax.Array) -> jax.Array:
    """DFS resume point: deepest level with live scan rows, -1 if none.
    Levels deeper than the current one are always drained (the work loop
    only descends into a freshly probed level), so this is exactly where
    the reference's recursion resumes."""
    n_levels = sc_count.shape[0]
    lvl = jnp.arange(n_levels, dtype=jnp.int32)
    return jnp.max(jnp.where(sc_count > 0, lvl, -1)).astype(jnp.int32)


class _WorkState(NamedTuple):
    """Per-chunk traversal state inside the work loop."""

    cur: jax.Array  # int32: current level, loop exits at -1
    in_cols: jax.Array  # int64[n_levels, W, block] per-level dense inputs
    in_count: jax.Array  # int32[n_levels]
    sc_cursor: jax.Array  # int64[n_levels, block]
    sc_end: jax.Array  # int64[n_levels, block]
    sc_sel: jax.Array  # int32[n_levels, block]
    sc_count: jax.Array  # int32[n_levels]
    pstate: PipelineState


def init_pipeline_state(
    n_levels: int, width: int, block: int, capacity: int,
    result_width: int | None = None,
) -> PipelineState:
    """`result_width` < `width` lets an executor carry auxiliary columns
    (e.g. SortedPipeline's precomputed rank columns) through the chunk
    stream and compactor caches without materializing them into the
    result store."""
    return PipelineState(
        cache_cols=jnp.zeros((n_levels, width, block), jnp.int64),
        cache_count=jnp.zeros((n_levels,), jnp.int32),
        result_count=jnp.asarray(0, jnp.int64),
        result_rows=jnp.zeros(
            (width if result_width is None else result_width, capacity),
            jnp.int64,
        ),
        result_stored=jnp.asarray(0, jnp.int64),
        occupancy=jnp.zeros((n_levels, block + 1), jnp.int64),
        level_steps=jnp.zeros((n_levels,), jnp.int32),
        level_rows=jnp.zeros((n_levels,), jnp.int32),
    )


class JoinPipeline:
    """The compiled N-way join pipeline over a fixed list of hash tables.

    `tables[l]` (LPTable or CSRTable) is level l's build side; level l
    probes input column l (main.cpp:131). Each level appends two output
    columns per PayloadMode (see exec/oracle.py). Strategy semantics:

     - NONE: threshold 0 — every chunk passes through untouched.
     - FULL/BINARY: static threshold block / block//2.
     - DYNAMIC: per-level thresholds chosen by the bandit between segments.
    """

    def __init__(
        self,
        tables: Sequence[LPTable | CSRTable],
        config: EngineConfig,
        result_capacity: int | None = None,
        prefilter=None,
        prefilter_col: int = 0,
        lanes: int = 1,
    ):
        """`prefilter`: optional traced predicate over one input column
        (ops/filter predicates) applied before level 0 — the canonical
        producer of under-filled chunks (BASELINE config 2); the filtered
        chunk flows into the join with a composed selection vector, NOT
        re-densified, so compaction strategies see real sparsity.

        `lanes`: run K independent pipelines in lockstep via vmap — the
        TPU-native answer to the reference's single-stream executor being
        latency-bound at one [block]-wide op per work-loop step. Each lane
        owns its compactor caches (compaction still applies per lane; the
        output multiset is unchanged). The per-step cost is amortized
        K-fold on the VPU; under vmap a level-switch executes all level
        branches with a select, so the win is ~K / n_joins."""
        self.tables = list(tables)
        self.config = config
        self.prefilter = prefilter
        self.prefilter_col = prefilter_col
        self.lanes = lanes
        self.n_levels = len(tables)
        self.block = config.block_size
        if config.collect_tuples:
            self.width = config.n_joins + 2 * self.n_levels
            self.capacity = (
                result_capacity if result_capacity is not None else 1 << 20
            )
        else:
            # count-only runs never read the per-level output columns
            # (the ResultCollector counts, main.cpp:125-128): drop them
            # from every [W, block] chunk op and skip the two per-step
            # column writes — the work loop is per-step-op-count bound.
            self.width = config.n_joins
            self.capacity = 0
        # columns [0, result_width) are observable result columns; a
        # subclass may widen `width` past this with auxiliary columns
        # that ride the chunk stream but never reach the result store
        self.result_width = self.width
        if self.lanes == 1:
            self._process = jax.jit(self._process_chunks, donate_argnums=(0,))
            self._flush = jax.jit(self._flush_all, donate_argnums=(0,))
            self._process_dyn_seg = jax.jit(
                self._process_seg_device_dynamic, donate_argnums=(0, 1)
            )
        else:
            # lane axis on pstate and the chunk stream; thresholds shared
            self._process = jax.jit(
                jax.vmap(self._process_chunks, in_axes=(0, 0, 0, None)),
                donate_argnums=(0,),
            )
            self._flush = jax.jit(
                jax.vmap(self._flush_all, in_axes=(0, None)),
                donate_argnums=(0,),
            )

    # ------------------------------------------------------------------
    # Work-loop building blocks
    # ------------------------------------------------------------------

    def fresh_state(self) -> PipelineState:
        return init_pipeline_state(
            self.n_levels, self.width, self.block, self.capacity,
            result_width=self.result_width,
        )

    def _probe_level(self, level_static: int, keys, count) -> ScanState:
        return self._probe_level_sel(
            level_static, keys, iota_sel(self.block), count
        )

    def _probe_level_sel(self, level_static: int, keys, sel, count) -> ScanState:
        table = self.tables[level_static]
        if isinstance(table, LPTable):
            return lp_probe(table, keys, sel, count)
        return csr_probe(table, keys, sel, count)

    def _collect(self, pstate: PipelineState, emitted: Chunk) -> PipelineState:
        """The ResultCollector (main.cpp:125-128): count always; materialize
        rows up to capacity when collect_tuples."""
        new_count = pstate.result_count + emitted.count.astype(jnp.int64)
        if self.capacity == 0:
            return pstate._replace(result_count=new_count)
        # auxiliary columns beyond result_width (rank columns) are dead
        # once the final level has consumed them — strip before storing
        if getattr(self, "_dense_chunks", False):
            # identity-sel chunks: mask stale storage, skip the gather
            from ccve_tpu.core.chunk import valid_mask

            dense = jnp.where(
                valid_mask(emitted)[None, :], emitted.cols, jnp.int64(0)
            )[: self.result_width]
        else:
            dense = gather_rows(emitted)[: self.result_width]
        lane = jnp.arange(self.block, dtype=jnp.int64)
        pos = jnp.where(
            lane < emitted.count, pstate.result_stored + lane, self.capacity
        )
        rows = pstate.result_rows.at[:, pos].set(dense, mode="drop")
        stored = jnp.minimum(
            pstate.result_stored + emitted.count, self.capacity
        )
        return pstate._replace(
            result_count=new_count, result_rows=rows, result_stored=stored
        )

    def _step(self, st: _WorkState, thresholds) -> _WorkState:
        """One Next at level `cur` (the body of the `while (ss.HasNext())`
        loop, main.cpp:150-161). The level is dispatched through ONE
        lax.switch whose branches are specialized per STATIC level: all
        state indexing is static, the probe table is direct (no inner
        switch), and only the relevant route exists — collect at the
        final level, descend elsewhere. The work loop is latency-bound
        at one block per step, so per-step op count is the throughput."""
        branches = [
            partial(self._step_at_level, l) for l in range(self.n_levels)
        ]
        return jax.lax.switch(st.cur, branches, st, thresholds)

    def _step_at_level(self, cur: int, st: _WorkState, thresholds) -> _WorkState:
        block, W, L = self.block, self.width, self.n_levels

        # per-level step counter (static index: `cur` is specialized)
        new_ps = st.pstate._replace(
            level_steps=st.pstate.level_steps.at[cur].add(1)
        )
        if self.config.strategy is CompactionStrategy.DYNAMIC:
            # occupancy signal for the tuner (see PipelineState.level_rows);
            # static strategies skip the extra per-step op entirely
            new_ps = new_ps._replace(
                level_rows=new_ps.level_rows.at[cur].add(st.sc_count[cur])
            )
        st = st._replace(pstate=new_ps)

        # --- Next (scan one entry per live row) -------------------------
        blk = st.in_cols[cur]
        keys = blk[cur]
        state = ScanState(
            cursor=st.sc_cursor[cur],
            end=st.sc_end[cur],
            sel=st.sc_sel[cur],
            count=st.sc_count[cur],
        )
        res = scan_next(
            self.tables[cur], keys, state, want_matches=self.capacity > 0
        )

        sc_cursor = st.sc_cursor.at[cur].set(res.state.cursor)
        sc_end = st.sc_end.at[cur].set(res.state.end)
        sc_sel = st.sc_sel.at[cur].set(res.state.sel)
        sc_count = st.sc_count.at[cur].set(res.state.count)

        # --- build the result chunk (Slice + GatherResult) --------------
        # Two output columns at n_joins + 2*cur(+1), written at the matched
        # storage positions (GatherResult's input-coordinate scatter,
        # chaining_ht.cpp:126-136), viewed through sel = result_vector.
        if self.capacity == 0:
            # count-only: the output columns are never read — no writes
            result_chunk = Chunk(blk, res.result_vector, res.result_count)
        else:
            lane = jnp.arange(block, dtype=jnp.int32)
            pos = jnp.where(
                lane < res.result_count, res.result_vector, block
            )
            if self.config.payload_mode is PayloadMode.REFERENCE:
                col_a_vals = jnp.zeros(block, jnp.int64)
                col_b_vals = res.matched_keys
            else:
                col_a_vals = res.matched_keys
                col_b_vals = res.matched_payloads
            # write rows (ca, ca+1) at the matched columns via ONE shared
            # one-hot: read the old column values, overlay the two target
            # rows elementwise, scatter all rows back (two 146-us XLA
            # scatters -> two ~5-us MXU matmuls, ops/mxu_move.py)
            from ccve_tpu.ops import mxu_move as mv

            ca = self.config.n_joins + 2 * cur
            old = mv.take_cols(blk, jnp.where(pos < block, pos, 0))
            row = jnp.arange(W, dtype=jnp.int32)[:, None]
            vals = jnp.where(
                row == ca,
                col_a_vals[None, :],
                jnp.where(row == ca + 1, col_b_vals[None, :], old),
            )
            blk = mv.put_cols(blk, pos, vals)
            result_chunk = Chunk(blk, res.result_vector, res.result_count)

        # --- compact -----------------------------------------------------
        if self.config.strategy is CompactionStrategy.NONE:
            emitted = result_chunk
            pstate = st.pstate
        else:
            cache = comp.CompactorState(
                cache_cols=st.pstate.cache_cols[cur],
                cache_count=st.pstate.cache_count[cur],
            )
            thr = thresholds[cur]
            emitted, new_cache = comp.compact(cache, result_chunk, thr)
            pstate = st.pstate._replace(
                cache_cols=st.pstate.cache_cols.at[cur].set(
                    new_cache.cache_cols
                ),
                cache_count=st.pstate.cache_count.at[cur].set(
                    new_cache.cache_count
                ),
            )

        # Zebra occupancy: record the emitted chunk's live-row count for
        # this level (the histogram that shows the tiny-chunk cascade).
        # Off by default — the reference compiles its ZebraProfiler out
        # (kEnableProfiling=0, profiler.h:170) and the scatter sits inside
        # the latency-bound work loop.
        if self.config.record_occupancy:
            pstate = pstate._replace(
                occupancy=pstate.occupancy.at[cur, emitted.count].add(1)
            )

        has_rows = emitted.count > 0

        if cur == L - 1:
            # --- final level: collect, stay ------------------------------
            collected = self._collect(pstate, emitted)
            pstate = jax.tree.map(
                lambda new, old: jnp.where(has_rows, new, old),
                collected,
                pstate,
            )
            return st._replace(
                cur=_deepest_pending(sc_count),
                sc_cursor=sc_cursor,
                sc_end=sc_end,
                sc_sel=sc_sel,
                sc_count=sc_count,
                pstate=pstate,
            )

        # --- descend: densify the emitted chunk into level cur+1 --------
        nxt = cur + 1

        def _descend(_):
            dense = gather_rows(emitted)  # [W, block]
            scan_n = self._probe_level(nxt, dense[nxt], emitted.count)

            def upd(stacked, new):
                return stacked.at[nxt].set(
                    jnp.where(has_rows, new, stacked[nxt])
                )

            sc_count2 = upd(sc_count, scan_n.count)
            return _WorkState(
                cur=_deepest_pending(sc_count2),
                in_cols=upd(st.in_cols, dense),
                in_count=upd(st.in_count, emitted.count),
                sc_cursor=upd(sc_cursor, scan_n.cursor),
                sc_end=upd(sc_end, scan_n.end),
                sc_sel=upd(sc_sel, scan_n.sel),
                sc_count=sc_count2,
                pstate=pstate,
            )

        if not self.config.branchy_descend:
            # branch-free: compute the descend unconditionally, rely on
            # the has_rows selects inside upd (has_rows is True for most
            # steps under NONE; A/B the alternative on chip)
            return _descend(None)

        def _stay(_):
            return st._replace(
                cur=_deepest_pending(sc_count),
                sc_cursor=sc_cursor,
                sc_end=sc_end,
                sc_sel=sc_sel,
                sc_count=sc_count,
                pstate=pstate,
            )

        return jax.lax.cond(has_rows, _descend, _stay, None)

    def _work_loop(self, st: _WorkState, thresholds) -> _WorkState:
        """Depth-first drain, pop-free: `cur` is maintained as the DEEPEST
        level with pending matches (the reference's recursion always
        resumes there, main.cpp:150-161 — levels deeper than `cur` are
        drained by construction, so the DFS resume point IS the deepest
        pending level). Each loop iteration performs exactly one Next;
        drained levels never cost an iteration, unlike the previous
        cond(step / pop) body where every drained level burned one
        latency-bound iteration on `cur -= 1`."""

        def cond(s: _WorkState):
            return s.cur >= 0

        def body(s: _WorkState):
            return self._step(s, thresholds)

        return jax.lax.while_loop(cond, body, st)

    def _fresh_work(self, pstate: PipelineState) -> _WorkState:
        L, W, B = self.n_levels, self.width, self.block
        return _WorkState(
            cur=jnp.asarray(0, jnp.int32),
            in_cols=jnp.zeros((L, W, B), jnp.int64),
            in_count=jnp.zeros((L,), jnp.int32),
            sc_cursor=jnp.zeros((L, B), jnp.int64),
            sc_end=jnp.zeros((L, B), jnp.int64),
            sc_sel=jnp.zeros((L, B), jnp.int32),
            sc_count=jnp.zeros((L,), jnp.int32),
            pstate=pstate,
        )

    # ------------------------------------------------------------------
    # Top-level jitted entry points
    # ------------------------------------------------------------------

    def _one_chunk(self, ps, cols, count, thresholds):
        """Push one input chunk through the whole pipeline (the body of
        the driver's chunk loop, main.cpp:86-95)."""
        work = self._fresh_work(ps)
        padded = work.in_cols.at[0, : self.config.n_joins, :].set(cols)
        if self.prefilter is not None:
            from ccve_tpu.core.chunk import compress_indices

            lane = jnp.arange(self.block, dtype=jnp.int32)
            keep = (lane < count) & self.prefilter(
                cols[self.prefilter_col]
            )
            sel0, count = compress_indices(keep)
            # probe through the filtered selection vector: the level-0
            # scan sees an under-filled chunk (sel sparsity preserved)
            scan0 = self._probe_level_sel(0, cols[0], sel0, count)
        else:
            scan0 = self._probe_level(0, cols[0], count)
        sc_count0 = work.sc_count.at[0].set(scan0.count)
        work = work._replace(
            cur=_deepest_pending(sc_count0),
            in_cols=padded,
            in_count=work.in_count.at[0].set(count),
            sc_cursor=work.sc_cursor.at[0].set(scan0.cursor),
            sc_end=work.sc_end.at[0].set(scan0.end),
            sc_sel=work.sc_sel.at[0].set(scan0.sel),
            sc_count=sc_count0,
        )
        return self._work_loop(work, thresholds).pstate

    def _process_chunks(self, pstate, chunk_cols, chunk_counts, thresholds):
        """lax.scan over a batch of input chunks: one device dispatch for
        the whole batch (the driver's chunk loop, main.cpp:86-95).

        chunk_cols: int64[n_chunks, n_joins, block]; counts: int32[n_chunks].
        """

        def one_chunk(ps, xs):
            cols, count = xs
            return self._one_chunk(ps, cols, count, thresholds), None

        pstate, _ = jax.lax.scan(one_chunk, pstate, (chunk_cols, chunk_counts))
        return pstate

    def _process_seg_device_dynamic(
        self, pstate, bstate, cols_seg, counts_seg
    ):
        """ONE segment of the DYNAMIC strategy with the ON-DEVICE tuner:
        select arms → run the segment's chunks → update arms, all inside
        the dispatch (control/device_bandit.py) — zero host syncs; the
        host's only job is feeding batches, so the H2D upload of segment
        k+1 overlaps the device's segment k exactly like the static
        path. (A single whole-stream dispatch was measured 2x slower:
        its one big batch upload — ~40 MB/s through the axon tunnel —
        serializes ahead of the compute it could have hidden under;
        scripts/probe_dyn_sections.py.)

        Reward = the segment's mean step occupancy at the level (rows
        per step / block): phase-invariant — a raw 1/steps reward tracks
        the stream's load (a high-selectivity phase produces 10x the
        steps of a low one for EVERY arm), so the bandit learned the
        phase, not the arm. Occupancy is what the threshold actually
        controls, and it stays in (0, 1], which also keeps the heartbeat
        double/halve detector (negative_feedback.hpp:67-81) pointed at
        real arm-quality shifts instead of load shifts. Per-LEVEL deltas
        give true per-level credit, which the reference's shared host
        timer never had (main.cpp:164-167).

        cols_seg: [seg, n_joins, block]; counts_seg: [seg]."""
        from ccve_tpu.control import device_bandit as db

        arms_vals = jnp.asarray(
            self.config.resolved_threshold_arms, jnp.int32
        )
        arm, bstate = db.select_arms(
            bstate, self.config.bandit_start_sampling
        )
        thresholds = jnp.take(arms_vals, arm)
        steps0 = pstate.level_steps
        rows0 = pstate.level_rows

        def one_chunk(p, x):
            c, cnt = x
            return self._one_chunk(p, c, cnt, thresholds), None

        pstate, _ = jax.lax.scan(one_chunk, pstate, (cols_seg, counts_seg))
        d_steps = (pstate.level_steps - steps0).astype(jnp.float32)
        d_rows = (pstate.level_rows - rows0).astype(jnp.float32)
        eff = d_rows / (jnp.maximum(d_steps, 1.0) * self.block)
        # CAUSAL credit shift (round 3): level l's threshold acts on the
        # chunks level l EMITS — its own occupancy/steps are fixed by
        # the incoming stream, so rewarding arm[l] with eff[l] is pure
        # noise (measured: the level-0 bandit committed to arbitrary
        # arms). Arm[l] is rewarded with level l+1's occupancy, where
        # its compaction decision actually lands; the last level's arm
        # has no downstream (collector only) and keeps its own eff —
        # genuinely don't-care on this executor, any commit is free.
        reward = jnp.concatenate([eff[1:], eff[-1:]])
        bstate = db.update_arms(
            bstate,
            arm,
            reward,
            self.config.bandit_start_sampling,
            self.config.bandit_commit_after,
        )
        return pstate, bstate

    def _flush_all(self, pstate, thresholds):
        """FlushPipelineCache (main.cpp:172-191): flush level l's cache into
        level l+1, in level order; refilled caches of deeper levels are
        flushed by the later iterations."""
        for level in range(self.n_levels):
            cache = comp.CompactorState(
                cache_cols=pstate.cache_cols[level],
                cache_count=pstate.cache_count[level],
            )
            flushed, fresh = comp.flush(cache)
            pstate = pstate._replace(
                cache_cols=pstate.cache_cols.at[level].set(fresh.cache_cols),
                cache_count=pstate.cache_count.at[level].set(fresh.cache_count),
            )
            if level + 1 == self.n_levels:
                has = flushed.count > 0
                collected = self._collect(pstate, flushed)
                pstate = jax.tree.map(
                    lambda new, old: jnp.where(has, new, old), collected, pstate
                )
            else:
                nxt = level + 1
                work = self._fresh_work(pstate)
                scan_n = self._probe_level(nxt, flushed.cols[nxt], flushed.count)
                sc_count_n = work.sc_count.at[nxt].set(scan_n.count)
                work = work._replace(
                    cur=_deepest_pending(sc_count_n),
                    in_cols=work.in_cols.at[nxt].set(flushed.cols),
                    in_count=work.in_count.at[nxt].set(flushed.count),
                    sc_cursor=work.sc_cursor.at[nxt].set(scan_n.cursor),
                    sc_end=work.sc_end.at[nxt].set(scan_n.end),
                    sc_sel=work.sc_sel.at[nxt].set(scan_n.sel),
                    sc_count=sc_count_n,
                )
                pstate = self._work_loop(work, thresholds).pstate
        return pstate

    # ------------------------------------------------------------------
    # Host driver
    # ------------------------------------------------------------------

    def _merge_lanes(self, pstate: PipelineState) -> PipelineState:
        """Combine K lane states into one result view: counts/occupancy
        sum; stored rows concatenate (lane caches are empty post-flush)."""
        rows = np.asarray(pstate.result_rows)  # [K, W, cap]
        stored = np.asarray(pstate.result_stored)  # [K]
        if self.capacity:
            merged_rows = np.concatenate(
                [rows[k, :, : int(stored[k])] for k in range(self.lanes)],
                axis=1,
            )
            pad = np.zeros(
                (
                    self.result_width,
                    max(self.capacity - merged_rows.shape[1], 0),
                ),
                np.int64,
            )
            merged_rows = np.concatenate([merged_rows, pad], axis=1)[
                :, : max(self.capacity, merged_rows.shape[1])
            ]
        else:
            merged_rows = np.zeros((self.width, 0), np.int64)
        return PipelineState(
            cache_cols=jnp.asarray(np.asarray(pstate.cache_cols)[0]),
            cache_count=jnp.asarray(np.asarray(pstate.cache_count).sum(0)),
            result_count=jnp.asarray(
                np.asarray(pstate.result_count).sum(), jnp.int64
            ),
            result_rows=jnp.asarray(merged_rows),
            result_stored=jnp.asarray(int(stored.sum()), jnp.int64),
            occupancy=jnp.asarray(np.asarray(pstate.occupancy).sum(0)),
            level_steps=jnp.asarray(np.asarray(pstate.level_steps).sum(0)),
            level_rows=jnp.asarray(np.asarray(pstate.level_rows).sum(0)),
        )

    def export_occupancy(
        self, occupancy: np.ndarray, total_seconds: float = 0.0
    ) -> None:
        """Feed the device-recorded per-level occupancy histograms into
        the ZebraProfiler (the reference's chunk-size histograms,
        profiler.h:178-237; CSV via ZebraProfiler.to_csv).

        Per-chunk device latency is not observable through the relay, so
        the run's total time is apportioned uniformly per recorded step —
        an ESTIMATE: each work-loop step costs roughly the same (the loop
        is latency-bound at one fixed-shape op chain per step, which is
        precisely why small chunks are wasteful — the reference's Zebra
        conclusion, profiler.h:170-260)."""
        from ccve_tpu.utils.profiler import ZebraProfiler

        zebra = ZebraProfiler.get()
        if not zebra.enabled:
            return
        total_steps = int(occupancy.sum())
        per_step = total_seconds / total_steps if total_steps else 0.0
        for level in range(self.n_levels):
            name = f"level{level}_{self.config.strategy.value}"
            hist = occupancy[level]
            for occ in np.nonzero(hist)[0]:
                cell = zebra._hists[name][int(occ)]
                cell[0] += per_step * int(hist[occ])
                cell[1] += int(hist[occ])

    def export_occupancy_segments(
        self, segments: list[tuple[float, np.ndarray]]
    ) -> None:
        """MEASURED Zebra attribution (run(zebra_profile=True)): each
        (seg_seconds, occ_delta) pair is one independent timing; the
        segment's time is split over ITS OWN recorded steps, so a
        per-occupancy mean aggregates as many real measurements as
        there are segments that touched that occupancy — the
        reference's per-call Zebra semantics (profiler.h:178-237) at
        segment granularity."""
        from ccve_tpu.utils.profiler import ZebraProfiler

        zebra = ZebraProfiler.get()
        if not zebra.enabled:
            return
        for seg_seconds, delta in segments:
            steps = int(delta.sum())
            if steps == 0:
                continue
            per_step = seg_seconds / steps
            for level in range(self.n_levels):
                name = f"level{level}_{self.config.strategy.value}"
                hist = delta[level]
                for occ in np.nonzero(hist)[0]:
                    cell = zebra._hists[name][int(occ)]
                    cell[0] += per_step * int(hist[occ])
                    cell[1] += int(hist[occ])

    def static_thresholds(self) -> np.ndarray:
        if self.config.strategy is CompactionStrategy.DYNAMIC:
            raise ValueError("DYNAMIC thresholds come from the tuner")
        if self.config.compact_threshold_per_level is not None:
            return np.asarray(
                self.config.compact_threshold_per_level, dtype=np.int32
            )
        return np.full(
            self.n_levels, self.config.compact_threshold, dtype=np.int32
        )

    def _run_device_dynamic(
        self, make_batch, counts, n_chunks, preload: bool = False
    ) -> dict:
        """DYNAMIC with the on-device tuner: one dispatch PER SEGMENT,
        zero per-segment host syncs — the bandit state rides the device
        between dispatches (the host-bandit path pays one ~28 ms relay
        readback per segment here; a single whole-stream dispatch pays
        its full batch H2D upload up front — ~0.8 s at 32 MB through the
        axon tunnel — while per-segment dispatches overlap segment k+1's
        upload with segment k's compute, like the static loop). The
        end-of-stream flush uses each level's greedy arm, read back once
        with the results."""
        from ccve_tpu.control import device_bandit as db

        cfg = self.config
        seg = cfg.tuner_segment_chunks
        n_seg = -(-n_chunks // seg)
        total = n_seg * seg
        counts_full = np.zeros(total, np.int32)
        counts_full[:n_chunks] = counts
        all_cols = all_counts = None
        if preload:
            # device-resident batch before the timed window (same
            # convention as the static path's preload)
            host = make_batch(0, n_chunks)
            if host.shape[0] < total:
                host = np.concatenate(
                    [
                        host,
                        np.zeros(
                            (total - host.shape[0],) + host.shape[1:],
                            np.int64,
                        ),
                    ]
                )
            all_cols = jnp.asarray(host)
            all_counts = jnp.asarray(counts_full)
            np.asarray(jax.device_get(all_cols[-1, -1, -1:]))
        t0 = time.perf_counter()

        pstate = self.fresh_state()
        bstate = db.init_state(
            self.n_levels, len(cfg.resolved_threshold_arms)
        )
        if preload:
            # device-resident feed: the WHOLE tuned stream is ONE
            # dispatch — a lax.scan over segments with (pstate, bstate)
            # carried, each step one bandit select/update round. The
            # per-segment host loop below exists only to overlap
            # streamed uploads with compute; with preloaded data it
            # just paid ~n_seg dispatch enqueues (122 at config-7 size)
            # that the statics' single dispatch no longer pays.
            if not hasattr(self, "_process_dyn_all"):
                def _all(ps, bs, cols, cnts):
                    def body(carry, xs):
                        p, b = carry
                        c, k = xs
                        p, b = self._process_seg_device_dynamic(
                            p, b, c, k
                        )
                        return (p, b), None

                    (ps2, bs2), _ = jax.lax.scan(body, (ps, bs), (cols, cnts))
                    return ps2, bs2

                self._process_dyn_all = jax.jit(
                    _all, donate_argnums=(0, 1)
                )
            pstate, bstate = self._process_dyn_all(
                pstate,
                bstate,
                all_cols.reshape(
                    (n_seg, seg) + all_cols.shape[1:]
                ),
                all_counts.reshape(n_seg, seg),
            )
        for s in range(0 if preload else n_seg):
            # streamed feed: per-segment dispatches overlap segment
            # k+1's H2D upload with segment k's compute
            s0 = s * seg
            cols_seg = make_batch(s0, min(s0 + seg, n_chunks))
            if cols_seg.shape[0] < seg:  # zero-pad the tail segment
                cols_seg = np.concatenate(
                    [
                        cols_seg,
                        np.zeros(
                            (seg - cols_seg.shape[0],)
                            + cols_seg.shape[1:],
                            np.int64,
                        ),
                    ]
                )
            cols_dev = jnp.asarray(cols_seg)
            counts_dev = jnp.asarray(counts_full[s0 : s0 + seg])
            pstate, bstate = self._process_dyn_seg(
                pstate, bstate, cols_dev, counts_dev
            )

        # ONE readback (end of stream): greedy thresholds for the flush
        est = np.asarray(jax.device_get(bstate.est))
        arms = np.asarray(cfg.resolved_threshold_arms, np.int32)
        thresholds = arms[est.argmax(1)]
        pstate = self._flush(pstate, jnp.asarray(thresholds))
        count = int(np.asarray(jax.device_get(pstate.result_count)))
        seconds = time.perf_counter() - t0

        out = {
            "count": count,
            "seconds": seconds,
            "chunks": n_chunks,
            "occupancy": np.asarray(pstate.occupancy),
            "bandit_est": est,
            "bandit_n_sel": np.asarray(bstate.n_sel),
            # early-commit history: which arm each level committed to
            # (-1 = never) and at which select round
            "bandit_committed": np.asarray(bstate.committed),
            "bandit_commit_t": np.asarray(bstate.commit_t),
            "greedy_thresholds": thresholds,
        }
        self.export_occupancy(out["occupancy"], total_seconds=seconds)
        if cfg.collect_tuples:
            stored = int(pstate.result_stored)
            out["rows"] = np.asarray(pstate.result_rows[:, :stored]).T
            out["overflowed"] = int(pstate.result_count) > stored
        return out

    def run(
        self,
        probe_rows: np.ndarray,
        segment_chunks: int | None = None,
        tuner: CompactTuner | None = None,
        preload: bool = False,
        zebra_profile: bool = False,
        sustain: int = 0,
    ) -> dict:
        """Stream a host probe table (int64[n, n_joins]) through the
        pipeline. Returns {'count', 'rows' (if collecting), 'seconds',
        'chunks'}.

        `preload` uploads the whole chunk batch to the device BEFORE the
        timed window and feeds segments as device-array slices — the
        same convention as the bulk engine's timings (configs.py
        device_puts the probe before `_timed`). Default off: the
        streaming feed (host chunk batches overlapped with compute) is
        the reference driver's shape (main.cpp:86-95) and the honest
        end-to-end number through this container's ~40 MB/s H2D tunnel,
        which otherwise floors every executor at upload bandwidth.

        `zebra_profile` gives the Zebra occupancy histograms MEASURED
        latency: each segment dispatch is synced and timed, and its
        wall time is attributed to that segment's occupancy deltas — so
        per-occupancy means come from as many independent timings as
        there are segments, not one uniform run-total apportionment
        (the reference's ZebraProfiler measures per call,
        profiler.h:178-237; per-STEP device time is not observable
        through the relay, so a segment is the attribution quantum).
        Requires config.record_occupancy; the per-segment syncs make
        this a PROFILING mode, not a timing mode — exactly like the
        reference, whose Zebra is compiled out of timed builds
        (profiler.h:170)."""
        cfg = self.config
        block = self.block
        probe_rows = np.ascontiguousarray(probe_rows, dtype=np.int64)
        n = probe_rows.shape[0]
        n_chunks = -(-n // block)
        seg = segment_chunks or cfg.tuner_segment_chunks

        dynamic = cfg.strategy is CompactionStrategy.DYNAMIC
        if (
            preload
            and not dynamic
            and not zebra_profile
            and segment_chunks is None
        ):
            # STATIC preloaded runs have no host decision between
            # segments (no tuner arm picks, no per-segment syncs) —
            # segmenting only multiplies relay dispatch latency (~15 ms
            # each through the axon tunnel; a 62-segment config-3 run
            # was dispatch-bound, round-4 measurement). One dispatch
            # carries the whole stream; streamed runs keep segments to
            # overlap H2D upload with compute.
            seg = n_chunks
        if dynamic:
            tuner = tuner or CompactTuner()
            if tuner.bandit_size() < self.n_levels:
                tuner.reset()
                for level in range(self.n_levels):
                    tuner.initialize(level, cfg.resolved_threshold_arms)
            # COORDINATE EXPLORATION: one segment time cannot be split
            # across levels (the reference's per-level host timers,
            # main.cpp:143-167, need its synchronous executor), so each
            # segment explores exactly ONE level's bandit — which then
            # receives the whole segment reward — while the other levels
            # exploit their current best arm. Round-robin over levels;
            # collapses to the reference's behavior at n_levels == 1.
            explore_level = 0

            def pick_thresholds():
                return np.array(
                    [
                        tuner.select_arm(l)
                        if l == explore_level
                        else tuner.greedy_arm(l)
                        for l in range(self.n_levels)
                    ],
                    np.int32,
                )

            thresholds = pick_thresholds()
        else:
            thresholds = self.static_thresholds()

        # Chunk counts; the feeder zero-pads the trailing partial chunk.
        pad_rows = n_chunks * block - n
        counts = np.full(n_chunks, block, np.int32)
        if pad_rows:
            counts[-1] = block - pad_rows

        from ccve_tpu import native

        lib = native.load()

        def make_batch(s0, s1):
            """[C, n_cols, block] column batch for chunks [s0, s1) — the
            native C++ feeder (ccve_make_chunk_batch) when available,
            NumPy otherwise (DataCollection::FetchChunk's hot loop)."""
            if lib is not None:
                import ctypes

                out = np.empty((s1 - s0) * cfg.n_joins * block, np.int64)
                p64 = ctypes.POINTER(ctypes.c_int64)
                lib.ccve_make_chunk_batch(
                    probe_rows.ctypes.data_as(p64),
                    n,
                    cfg.n_joins,
                    block,
                    s0,
                    s1 - s0,
                    out.ctypes.data_as(p64),
                )
                return out.reshape(s1 - s0, cfg.n_joins, block)
            padded = np.zeros(((s1 - s0) * block, cfg.n_joins), np.int64)
            take = min(s1 * block, n) - s0 * block
            padded[:take] = probe_rows[s0 * block : s0 * block + take]
            batch = padded.reshape(s1 - s0, block, cfg.n_joins)
            return np.ascontiguousarray(np.swapaxes(batch, 1, 2))

        K = self.lanes
        per = -(-n_chunks // K)  # chunks per lane (tail lanes zero-padded)
        counts_padded = np.zeros(per * K, np.int32)
        counts_padded[:n_chunks] = counts

        if zebra_profile:
            if not cfg.record_occupancy:
                raise ValueError(
                    "zebra_profile needs config.record_occupancy=True"
                )
            if K != 1:
                raise ValueError("zebra_profile supports lanes == 1 only")
        zebra_segs: list[tuple[float, np.ndarray]] = []
        prev_occ = np.zeros(
            (self.n_levels, self.block + 1), np.int64
        )

        if dynamic and cfg.device_tuner:
            if K != 1:
                raise ValueError("device_tuner requires lanes == 1")
            if zebra_profile:
                raise ValueError(
                    "zebra_profile is not supported on the device-tuner "
                    "path (its segments are not synced per dispatch)"
                )
            return self._run_device_dynamic(
                make_batch, counts, n_chunks, preload=preload
            )

        pstate = self.fresh_state()
        if K > 1:
            # materialized copies (not lazy broadcasts): the lane states are
            # donated to the first dispatch
            pstate = jax.tree.map(
                lambda x: jnp.stack([x] * K), pstate
            )
        all_cols = all_counts = None
        if preload:
            if K != 1:
                raise ValueError("preload supports lanes == 1 only")
            all_cols = jnp.asarray(make_batch(0, per))
            all_counts = jnp.asarray(counts_padded)
            # force the upload to complete outside the timed window
            np.asarray(jax.device_get(all_cols[-1, -1, -1:]))
        if sustain:
            # SUSTAINED serving regime (the bulk engine's methodology,
            # bench.py): the whole run — fresh state, process, flush —
            # chained `sustain` times in ONE device fori_loop with a
            # data-dependent always-zero bias defeating CSE, paying the
            # relay sync once. Only meaningful for static preloaded
            # runs (one host decision total).
            if not preload or dynamic or zebra_profile:
                raise ValueError(
                    "sustain requires preload=True and a static "
                    "strategy without zebra_profile"
                )
            thr = jnp.asarray(thresholds)

            @jax.jit
            def sustained(cols, counts):
                def body(_, acc):
                    bias = jnp.where(acc < 0, 1, 0).astype(cols.dtype)
                    ps = self._process_chunks(
                        self.fresh_state(), cols + bias, counts, thr
                    )
                    if cfg.strategy is not CompactionStrategy.NONE:
                        ps = self._flush_all(ps, thr)
                    return acc + ps.result_count

                return jax.lax.fori_loop(0, sustain, body, jnp.int64(0))

            total = int(sustained(all_cols, all_counts))  # warm/compile
            count = total // sustain
            assert total == count * sustain, (total, sustain)
            t0 = time.perf_counter()
            int(sustained(all_cols, all_counts))
            per_run = (time.perf_counter() - t0) / sustain
            return {
                "count": count,
                "seconds": per_run,
                "chunks": n_chunks,
                "preloaded": True,
                "sustained": sustain,
            }
        t0 = time.perf_counter()
        for s0 in range(0, per, seg):
            s1 = min(s0 + seg, per)
            if preload:
                batch_cols = all_cols[s0:s1]
                ccounts = all_counts[s0:s1]
            elif K == 1:
                batch_cols = jnp.asarray(make_batch(s0, s1))
                ccounts = jnp.asarray(counts_padded[s0:s1])
            else:
                batch_cols = jnp.asarray(
                    np.stack(
                        [make_batch(k * per + s0, k * per + s1) for k in range(K)]
                    )
                )
                ccounts = jnp.asarray(
                    np.stack(
                        [
                            counts_padded[k * per + s0 : k * per + s1]
                            for k in range(K)
                        ]
                    )
                )
            seg_t0 = time.perf_counter()
            pstate = self._process(
                pstate, batch_cols, ccounts, jnp.asarray(thresholds)
            )
            if dynamic:
                # runs BEFORE any zebra readback so profiling overhead
                # never contaminates the bandit's per-segment reward
                # clock. Scalar readback: the only sync that actually
                # waits through the axon relay (block_until_ready
                # returns early there — PERF_NOTES.md)
                np.asarray(jax.device_get(pstate.result_count))
                seg_time = (time.perf_counter() - seg_t0) / ((s1 - s0) * K)
            if zebra_profile:
                # the occupancy readback IS the segment sync
                occ = np.asarray(jax.device_get(pstate.occupancy))
                zebra_segs.append(
                    (time.perf_counter() - seg_t0, occ - prev_occ)
                )
                prev_occ = occ
            if dynamic:
                # reference reward shape: 2 / per-chunk-time / 1e3
                # (main.cpp:164-166); credited to the explored level only
                reward = 2.0 / max(seg_time, 1e-12) / 1e3
                tuner.update_arm(
                    explore_level, int(thresholds[explore_level]), reward
                )
                explore_level = (explore_level + 1) % self.n_levels
                thresholds = pick_thresholds()
        if cfg.strategy is not CompactionStrategy.NONE:
            flush_t0 = time.perf_counter()
            pstate = self._flush(pstate, jnp.asarray(thresholds))
            if zebra_profile:
                # the flush cascade is its own attribution segment
                occ = np.asarray(jax.device_get(pstate.occupancy))
                zebra_segs.append(
                    (time.perf_counter() - flush_t0, occ - prev_occ)
                )
                prev_occ = occ
        # honest end-of-run sync: one scalar readback (block_until_ready
        # returns early through the axon relay — PERF_NOTES.md)
        count = int(np.asarray(jax.device_get(pstate.result_count)).sum())
        seconds = time.perf_counter() - t0
        if K > 1:
            pstate = self._merge_lanes(pstate)

        out = {
            "count": count,
            "seconds": seconds,
            "chunks": n_chunks,
            "preloaded": preload,
            "occupancy": np.asarray(pstate.occupancy),
        }
        if zebra_profile:
            out["zebra_segments"] = len(zebra_segs)
            self.export_occupancy_segments(zebra_segs)
        else:
            self.export_occupancy(out["occupancy"], total_seconds=seconds)
        if cfg.collect_tuples:
            stored = int(pstate.result_stored)
            out["rows"] = np.asarray(pstate.result_rows[:, :stored]).T
            out["overflowed"] = int(pstate.result_count) > stored
        return out
