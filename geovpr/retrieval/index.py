"""HBM-resident descriptor retrieval.

The reference never implements retrieval — it only regresses on SALAD
descriptors (`dinov2salad/dinov2salad_finetuning.py:28-37`); there is no
nearest-neighbor / Recall@k code anywhere in the snapshot (SURVEY.md §0).
This module adds the BASELINE.json north-star capability natively:

- the database lives on device (HBM) in bf16 (2 bytes/dim: a 1M-image,
  8448-dim index is ~16.9 GB — sharded over the mesh `data` axis for larger
  fleets),
- query scoring is one cosine matmul on the MXU (`q @ db.T`, fp32
  accumulation) + `jax.lax.top_k` on device — no host round-trip,
- multi-chip: the database is sharded row-wise; each shard computes its
  local top-k, then the (k * n_shards) candidates are gathered and reduced
  to a global top-k — `shard_map` + `all_gather` over ICI.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from geovpr.models.layers import normalize_l2


def cosine_topk(queries: jax.Array, database: jax.Array, k: int,
                normalized: bool = True):
    """Top-k cosine similarity. queries (Q, D), database (N, D).

    Returns (scores (Q, k), indices (Q, k)). With `normalized=False`, inputs
    are L2-normalized first.
    """
    if not normalized:
        queries = normalize_l2(queries)
        database = normalize_l2(database)
    scores = jnp.matmul(queries, database.T,
                        preferred_element_type=jnp.float32)
    return jax.lax.top_k(scores, k)


def recall_at_k(retrieved_idx: jax.Array, positives: jax.Array,
                k: int) -> jax.Array:
    """Recall@k: fraction of queries whose true match appears in the first k
    retrieved indices. positives: (Q,) ground-truth database index."""
    hits = (retrieved_idx[:, :k] == positives[:, None]).any(axis=1)
    return jnp.mean(hits.astype(jnp.float32))


def _quantize_rows(x: jax.Array):
    """Symmetric per-row int8 quantization: returns (q (N, D) int8,
    scale (N,) f32) with x ≈ q * scale[:, None]. Zero rows get scale 1."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[:, None]),
                 -127, 127).astype(jnp.int8)
    return q, scale


def chunk_topk(qb, qsb, db, db_scale, k: int, *, db_block: int = 0,
               col_offset=0, n_real: Optional[int] = None,
               method: str = "exact", recall: float = 0.99):
    """Top-k of the cosine-score plane for ONE query block against `db`
    rows, with three execution strategies (measured round 5, 1M x 8448
    int8 gallery on one v5e — benches/RETRIEVAL_OPT_r05.log):

    - ``db_block=0`` single-shot (default): one (Q, rows) plane + one
      full-width `lax.top_k`. At 1M the top_k pass costs 47.8% of the
      step (matmul-only ablation) and the f32 plane (4.3 GB at
      chunk=1024) caps the query chunk.
    - ``db_block=N`` two-stage blocked EXACT top-k: `lax.map` over row
      blocks, per-block top-min(k, N) (every true global top-k entry is
      in its own block's top-k — pigeonhole), then one merge top-k over
      the (Q, nb*k) candidate strip. Only one (Q, N) plane lives at a
      time, so the query chunk can grow past the HBM cap — but it is NOT
      a speed lever: measured 11,279 -> 11,521 q/s at N=131072 and
      10,928 at 65536 (XLA's top_k cost is ~linear in plane area). A
      non-multiple row tail is handled as one extra narrow block.
    - ``method="approx"``: `jax.lax.approx_max_k` (the TPU-native
      PartialReduce top-k) at the given `recall_target` — composes with
      db_block. THIS is the throughput lever: 21,895 q/s at 0.99 (1.94x,
      top-10 overlap 0.9953 vs exact), i.e. the matmul ceiling.

    Padded gallery rows (col_offset + local col >= n_real) are masked to
    -inf IN THE PLANE, before any top-k: masking after the reduction (the
    round-4 scheme) could let a padded zero-score row displace a real
    negative-cosine candidate from a shard's local top-k and lose it
    (tests/test_retrieval.py::test_sharded_padded_negative_scores).
    `col_offset` may be traced (the mesh path passes
    axis_index * shard_rows)."""
    n_rows = db.shape[0]
    mask_needed = n_real is not None

    def reduce_k(plane, kk):
        if method == "approx":
            return jax.lax.approx_max_k(plane, kk, recall_target=recall)
        return jax.lax.top_k(plane, kk)

    def score(dbb, dsb, off):
        plane = DescriptorIndex._scores(qb, qsb, dbb, dsb)
        if mask_needed:
            col = jax.lax.broadcasted_iota(jnp.int32, plane.shape, 1)
            plane = jnp.where(col_offset + off + col < n_real, plane,
                              -jnp.inf)
        return plane

    if not db_block or n_rows <= db_block:
        s, i = reduce_k(score(db, db_scale, 0), k)
        return s, i.astype(jnp.int32)

    nb = n_rows // db_block
    rem = n_rows - nb * db_block
    kb = min(k, db_block)
    offs = jnp.arange(nb, dtype=jnp.int32) * db_block
    main = db[:nb * db_block].reshape(nb, db_block, db.shape[1])

    def one(args):
        if db_scale is None:
            dbb, off = args
            dsb = None
        else:
            dbb, dsb, off = args
        s, i = reduce_k(score(dbb, dsb, off), kb)
        return s, i.astype(jnp.int32) + off

    if db_scale is None:
        ss, ii = jax.lax.map(one, (main, offs))
    else:
        mains = db_scale[:nb * db_block].reshape(nb, db_block)
        ss, ii = jax.lax.map(one, (main, mains, offs))
    q_n = ss.shape[1]
    cand_s = ss.transpose(1, 0, 2).reshape(q_n, nb * kb)
    cand_i = ii.transpose(1, 0, 2).reshape(q_n, nb * kb)
    if rem:
        kt = min(k, rem)
        ts, ti = reduce_k(
            score(db[nb * db_block:],
                  None if db_scale is None else db_scale[nb * db_block:],
                  nb * db_block), kt)
        cand_s = jnp.concatenate([cand_s, ts], axis=1)
        cand_i = jnp.concatenate(
            [cand_i, ti.astype(jnp.int32) + nb * db_block], axis=1)
    best, pos = jax.lax.top_k(cand_s, k)
    return best, jnp.take_along_axis(cand_i, pos, axis=1)


@dataclasses.dataclass
class DescriptorIndex:
    """On-device descriptor database with sharded search.

    Build once with `.build(descriptors)`; query with `.search(queries, k)`.
    When a mesh is provided the database rows are sharded over its `data`
    axis and search runs as local-topk -> all-gather -> global-topk.

    `quantize=True` stores the database int8 with per-row scales (symmetric
    PTQ after L2 normalization): 4x the HBM capacity of bf16 — a 1M-image
    8448-dim index drops 16.9 -> 8.4 GB, VALIDATED on one v5e chip: built
    streaming in 12.1 s, searched at 11,281 q/s, recall@1 probe 1.0
    (round 4, benches/RETRIEVAL_1M_r04.log) — and the score pass runs
    int8 x int8 -> int32 on the MXU (slope-measured ~2x bf16 dot throughput
    at these shapes, docs/DESIGN.md). Queries are quantized per-row at
    search time; true inner products of the quantized vectors are restored
    exactly by the rank-1 scale outer product, so the only ranking error is
    the ~1/254 per-component rounding (descriptor cosine >= 0.9999 at
    D=8448)."""

    dim: int
    dtype: jnp.dtype = jnp.bfloat16
    mesh: Optional[Mesh] = None
    axis: str = "data"
    quantize: bool = False
    # static query-chunk size: `search` scans over ceil(Q/chunk) blocks so
    # the f32 score plane held live is (chunk, shard_rows) instead of
    # (Q, shard_rows) — a 100k-query sweep of a 1M-row gallery would
    # otherwise materialize a 400 GB plane and OOM HBM. 0 disables chunking.
    query_chunk: int = 1024
    # database-row block size for the two-stage blocked top-k (see
    # `chunk_topk`): per-block top-k under a lax.map, then one merge top-k
    # over the candidate strip — exact, and the full (chunk, rows) plane
    # never materializes. Default 0 (single-shot): measured round 5 at
    # 1M x 8448 int8, blocking is a FUTILE exactness lever — 11,279 ->
    # 11,521 q/s at 131072 (+2%) and 10,928 at 65536 (-3%); XLA's top_k
    # cost is ~linear in plane area, so splitting the width doesn't
    # remove it (benches/RETRIEVAL_OPT_r05.log).
    db_block: int = 0
    # "exact" (lax.top_k) or "approx" (lax.approx_max_k at approx_recall,
    # the TPU-native PartialReduce top-k). Measured round 5 at 1M x 8448
    # int8, k=10 (same log): exact 11,279 q/s with the top-k pass costing
    # 47.8% of the step (matmul-only ablation 189.3 ms vs 362.9 full);
    # approx runs AT the matmul ceiling — 21,914 q/s at recall 0.95
    # (top-10 overlap vs exact 0.9777 on random queries) and 21,895 at
    # 0.99 (overlap 0.9953, probe recall@1 1.0) — 1.94x for ~0.5% top-10
    # disagreement. Default stays exact (eval metrics replicate exactly);
    # serving deployments should flip to approx.
    topk_method: str = "exact"
    approx_recall: float = 0.99
    _db: Optional[jax.Array] = None
    _db_scale: Optional[jax.Array] = None
    _n: int = 0
    # compiled sharded-search executables keyed by k — rebuilding the
    # shard_map closure per call would retrace/recompile on every search
    _search_cache: dict = dataclasses.field(default_factory=dict)

    def build(self, descriptors: jax.Array | np.ndarray,
              normalized: bool = True) -> "DescriptorIndex":
        x = jnp.asarray(descriptors)
        if x.shape[-1] != self.dim:
            raise ValueError(f"descriptor dim {x.shape[-1]} != index dim {self.dim}")
        if not normalized:
            x = normalize_l2(x)
        if self.quantize:
            self._install(*_quantize_rows(x))
        else:
            self._install(x.astype(self.dtype), None)
        return self

    def build_chunked(self, chunks, total: int,
                      normalized: bool = True) -> "DescriptorIndex":
        """Build from an iterator of row chunks without ever materializing
        the full-precision gallery: a 1M x 8448 f32 descriptor array is
        33.8 GB — it cannot exist on a 16 GB chip (or cheaply on the host),
        but its int8 index (8.4 GB + scales) fits. Each chunk is quantized/
        cast on device as it arrives and written into a preallocated
        destination:

        - mesh=None: the destination buffer lives on device and is filled
          in place via a donated dynamic_update_slice jit — peak HBM is the
          final index + ONE f32 chunk.
        - mesh: chunks are quantized on device, staged to the host, and the
          assembled rows are installed with one sharded device_put (the
          destination sharding isn't knowable until the padded row count
          is).

        `total` must equal the summed chunk rows (checked)."""
        if self.mesh is not None:
            # one preallocated host destination at the PADDED size, filled
            # chunk-by-chunk — list-append + concatenate would transiently
            # hold the staged gallery TWICE in host RAM (ADVICE r4), and
            # an unpadded buffer would make _install's padding concat do
            # the same. The row dtype comes from the first quantized/cast
            # chunk (ml_dtypes bfloat16 is a valid numpy dtype, so bf16
            # stages at 2 bytes/dim).
            total_store = self._rows_multiple(total)
            rows = scales = None
            off = 0
            for c in chunks:
                q, s = self._quantize_chunk(jnp.asarray(c), normalized)
                q_np = np.asarray(jax.device_get(q))
                if rows is None:
                    rows = np.zeros((total_store, self.dim), q_np.dtype)
                    scales = (np.ones((total_store,), np.float32)
                              if s is not None else None)
                n_c = q_np.shape[0]
                if off + n_c > total:
                    raise ValueError(f"chunks exceed total={total}")
                rows[off:off + n_c] = q_np
                if s is not None:
                    scales[off:off + n_c] = np.asarray(jax.device_get(s))
                off += n_c
            if off != total:
                raise ValueError(f"chunks carried {off} rows, "
                                 f"expected total={total}")
            # already padded: _install ships the final layout in ONE
            # device_put, no further host or device copies
            self._install(rows, scales, n_real=total)
            return self

        store_dtype = jnp.int8 if self.quantize else self.dtype
        # preallocate at the PADDED size (see _rows_multiple) so the
        # blocked top-k's reshape stays a bitcast; padding rows stay zero
        # (scale 1) and are masked at search by n_real
        total_store = self._rows_multiple(total)
        dst = jnp.zeros((total_store, self.dim), store_dtype)
        dst_scale = (jnp.ones((total_store,), jnp.float32)
                     if self.quantize else None)

        @functools.partial(jax.jit, donate_argnums=(0, 1),
                           static_argnums=(4,))
        def fill(dst, dst_scale, chunk, off, norm):
            x = chunk.astype(jnp.float32)
            if not norm:
                x = normalize_l2(x)
            if self.quantize:
                q, s = _quantize_rows(x)
                dst_scale = jax.lax.dynamic_update_slice(dst_scale, s, (off,))
            else:
                q = x.astype(self.dtype)
            dst = jax.lax.dynamic_update_slice(dst, q, (off, 0))
            return dst, dst_scale

        off = 0
        for c in chunks:
            c = jnp.asarray(c)
            if off + c.shape[0] > total:
                raise ValueError(f"chunks exceed total={total}")
            dst, dst_scale = fill(dst, dst_scale, c,
                                  jnp.int32(off), normalized)
            off += c.shape[0]
        if off != total:
            raise ValueError(f"chunks carried {off} rows, "
                             f"expected total={total}")
        self._install(dst, dst_scale, n_real=total)
        return self

    def _quantize_chunk(self, x: jax.Array, normalized: bool):
        """Quantize/cast one chunk of rows on device (no install)."""
        if not normalized:
            x = normalize_l2(x)
        if self.quantize:
            return _quantize_rows(x)
        return x.astype(self.dtype), None

    def _rows_multiple(self, n: int) -> int:
        """Install-time row multiple: shards x (db_block when the blocked
        top-k will actually split a shard). Padding to this multiple at
        install time makes chunk_topk's (nb, db_block, D) reshape a free
        bitcast — a non-multiple gallery would force a SLICE, which
        materializes a near-full copy of the database on device (the
        round-5 1M OOM)."""
        n_shards = self.mesh.shape[self.axis] if self.mesh is not None else 1
        shard = -(-n // n_shards)
        if self.db_block and shard > self.db_block:
            shard = -(-shard // self.db_block) * self.db_block
        return shard * n_shards

    @property
    def _padded(self) -> bool:
        return self._db is not None and self._db.shape[0] != self._n

    def _install(self, rows, scale, n_real: Optional[int] = None):
        """Place (already-quantized/cast) database rows on device, padded
        to the blocked-top-k row multiple (zero rows, masked at search by
        `n_real`) and sharded over the mesh's data axis when one is
        attached. Shared by `build`, `build_chunked`, and `load`; rows may
        arrive host-side (numpy) — padding then happens on the host, so a
        big load never holds two device copies."""
        # the cached searchers bake in THIS build's n_real/shard_rows/local_k;
        # a rebuild with a different database size would silently reuse stale
        # offsets and padded-row masks, returning wrong neighbors
        self._search_cache.clear()
        self._n = int(n_real if n_real is not None else rows.shape[0])
        pad = self._rows_multiple(rows.shape[0]) - rows.shape[0]
        if pad:
            if isinstance(rows, np.ndarray):
                rows = np.concatenate(
                    [rows, np.zeros((pad, self.dim), rows.dtype)])
                if scale is not None:
                    scale = np.concatenate(
                        [np.asarray(scale), np.ones((pad,), np.float32)])
            else:
                rows = jnp.concatenate(
                    [rows, jnp.zeros((pad, self.dim), rows.dtype)], axis=0)
                if scale is not None:
                    scale = jnp.concatenate(
                        [scale, jnp.ones((pad,), scale.dtype)])
        if self.mesh is not None:
            sharding = NamedSharding(self.mesh, P(self.axis, None))
            self._db = jax.device_put(rows, sharding)
            if scale is not None:
                self._db_scale = jax.device_put(
                    jnp.asarray(scale), NamedSharding(self.mesh,
                                                      P(self.axis)))
        else:
            self._db = jnp.asarray(rows)
            self._db_scale = None if scale is None else jnp.asarray(scale)

    @property
    def size(self) -> int:
        return self._n

    def _prep_queries(self, queries: jax.Array):
        """Query operands for the score matmul: (q_int8, q_scale) when
        quantized, else the dtype-cast queries."""
        if self.quantize:
            return _quantize_rows(jnp.asarray(queries))
        return jnp.asarray(queries, self.dtype), None

    @staticmethod
    def _scores(q, q_scale, db, db_scale):
        """Inner-product score plane (Q, rows) in f32. With scales, the
        matmul runs int8 x int8 -> int32 on the MXU and the rank-1 scale
        outer product restores the quantized vectors' true inner
        products."""
        if q_scale is not None:
            si = jax.lax.dot_general(q, db, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.int32)
            return (si.astype(jnp.float32) * q_scale[:, None]
                    * db_scale[None, :])
        return jnp.matmul(q.astype(jnp.float32),
                          db.astype(jnp.float32).T,
                          preferred_element_type=jnp.float32)

    def _pad_queries(self, q, q_scale):
        """Pad the query rows to a multiple of `query_chunk` (when chunking
        is active) so the scan has a static block shape. Returns
        (q, q_scale, n_chunks, Q_real); n_chunks == 1 means single-shot."""
        n_q = q.shape[0]
        chunk = self.query_chunk
        if not chunk or n_q <= chunk:
            return q, q_scale, 1, n_q
        pad = (-n_q) % chunk
        if pad:
            q = jnp.concatenate(
                [q, jnp.zeros((pad, self.dim), q.dtype)], axis=0)
            if q_scale is not None:
                q_scale = jnp.concatenate(
                    [q_scale, jnp.ones((pad,), q_scale.dtype)])
        return q, q_scale, q.shape[0] // chunk, n_q

    @staticmethod
    def _map_chunks(fn, q, q_scale, n_chunks, n_q, k):
        """Run `fn(q_blk, qs_blk) -> (scores, idx)` over n_chunks static
        query blocks via lax.map (a compiled scan: one live score plane at a
        time) and re-flatten, slicing off the padded query rows."""
        if n_chunks == 1:
            scores, idx = fn(q, q_scale)
            return scores[:n_q], idx[:n_q]
        chunk = q.shape[0] // n_chunks
        qb = q.reshape(n_chunks, chunk, q.shape[1])
        if q_scale is None:
            scores, idx = jax.lax.map(lambda b: fn(b, None), qb)
        else:
            qsb = q_scale.reshape(n_chunks, chunk)
            scores, idx = jax.lax.map(lambda b: fn(*b), (qb, qsb))
        return (scores.reshape(-1, k)[:n_q], idx.reshape(-1, k)[:n_q])

    def search(self, queries: jax.Array, k: int):
        """Returns (scores (Q, k), indices (Q, k)) of cosine top-k matches.
        Padded database rows are masked to -inf so they can never appear in
        the top-k; queries are processed in `query_chunk`-row blocks so HBM
        holds one (chunk, shard_rows) score plane at a time."""
        if self._db is None:
            raise ValueError("index not built")
        if k > self._n:
            raise ValueError(f"k={k} exceeds index size {self._n}")
        q, q_scale = self._prep_queries(queries)
        q, q_scale, n_chunks, n_q = self._pad_queries(q, q_scale)

        if self.mesh is None:
            # compiled + cached like the mesh path: the blocked top-k's
            # (nb, db_block, D) reshape is a free bitcast UNDER JIT but an
            # 8.9 GB device COPY in eager dispatch (round-5 1M OOM #2) —
            # and a cached executable also kills per-call retrace cost
            n_real = self._n if self._padded else None
            db_block, method = self.db_block, self.topk_method
            recall = self.approx_recall
            quantize = self.quantize
            cache_key = ("local", k, n_chunks, q.shape[0], db_block,
                         method, recall)
            if cache_key not in self._search_cache:
                def local_topk(*ops):
                    if quantize:
                        db, db_scale, qq, qs = ops
                    else:
                        (db, qq), db_scale, qs = ops, None, None
                    return self._map_chunks(
                        lambda qb, qsb: chunk_topk(
                            qb, qsb, db, db_scale, k, db_block=db_block,
                            n_real=n_real, method=method, recall=recall),
                        qq, qs, n_chunks, qq.shape[0], k)
                self._search_cache[cache_key] = jax.jit(local_topk)
            db_args = ((self._db, self._db_scale) if quantize
                       else (self._db,))
            q_args = (q, q_scale) if quantize else (q,)
            out = self._search_cache[cache_key](*db_args, *q_args)
            return out[0][:n_q], out[1][:n_q]

        mesh, axis = self.mesh, self.axis
        n_shards = mesh.shape[axis]
        shard_rows = self._db.shape[0] // n_shards

        db_args = ((self._db, self._db_scale) if self.quantize
                   else (self._db,))
        q_args = (q, q_scale) if self.quantize else (q,)
        # the compiled searcher bakes in the chunk count — jit retraces on a
        # changed query shape, but the host-side cache key must distinguish
        # chunk layouts too
        cache_key = (k, n_chunks, q.shape[0], self.db_block,
                     self.topk_method, self.approx_recall)
        if cache_key in self._search_cache:
            out = self._search_cache[cache_key](*db_args, *q_args)
            return out[0][:n_q], out[1][:n_q]
        # each shard can contribute at most its own rows; n_shards * local_k
        # always covers the global k because k <= total rows (pigeonhole:
        # the true global top-k draws at most shard_rows entries from any
        # one shard) — tests/test_retrieval.py covers k > shard_rows
        local_k = min(k, shard_rows)

        n_real = self._n
        quantize = self.quantize
        db_block = self.db_block
        topk_method = self.topk_method
        approx_recall = self.approx_recall

        def local_search(*ops):
            if quantize:
                db_shard, dbs_shard, q_rep, qs_rep = ops
            else:
                (db_shard, q_rep), dbs_shard, qs_rep = ops, None, None

            def one_chunk(q_blk, qs_blk):
                # db_shard: (rows, D) local; q_blk: (chunk, D) replicated.
                # Padded zero rows (global col >= n_real) are masked to
                # -inf in the PLANE (inside chunk_topk), before the local
                # top-k: masking after it could let a padded zero-score
                # row displace a real negative-cosine candidate from this
                # shard's local top-k and lose it (SALAD descriptors have
                # negative components).
                shard_i = jax.lax.axis_index(axis)
                scores, idx = chunk_topk(
                    q_blk, qs_blk, db_shard, dbs_shard, local_k,
                    db_block=db_block, col_offset=shard_i * shard_rows,
                    n_real=n_real, method=topk_method,
                    recall=approx_recall)
                idx = idx + shard_i * shard_rows
                # gather candidates from all shards: (n_shards*local_k)
                # per query
                all_scores = jax.lax.all_gather(scores, axis, axis=1)
                all_idx = jax.lax.all_gather(idx, axis, axis=1)
                all_scores = all_scores.reshape(all_scores.shape[0], -1)
                all_idx = all_idx.reshape(all_idx.shape[0], -1)
                best, pos = jax.lax.top_k(all_scores, k)
                return best, jnp.take_along_axis(all_idx, pos, axis=1)

            # chunk INSIDE the shard_map: one shard_map dispatch, one live
            # (chunk, shard_rows) plane per step of the scan
            return self._map_chunks(one_chunk, q_rep, qs_rep,
                                    n_chunks, q_rep.shape[0], k)

        in_specs = ((P(axis, None), P(axis), P(), P()) if quantize
                    else (P(axis, None), P()))
        fn = jax.shard_map(
            local_search, mesh=mesh,
            in_specs=in_specs,
            out_specs=(P(), P()),
            # outputs are value-replicated after the all_gather + local
            # top_k, but the static VMA checker cannot prove it
            check_vma=False)
        self._search_cache[cache_key] = jax.jit(fn)
        out = self._search_cache[cache_key](*db_args, *q_args)
        return out[0][:n_q], out[1][:n_q]


def save_index(index: DescriptorIndex, path: str,
               filenames=None, latlon=None) -> None:
    """Persist a built index to one `.npz` (int8 rows + per-row scales when
    quantized; bf16 rows stored as their uint16 bit pattern — numpy has no
    native bfloat16). Optional gallery metadata (filenames, latlon) rides
    along so a serving process needs only this one artifact. The reference
    has no retrieval at all (SURVEY.md §0) — build-once/serve-many is the
    production shape of the new capability."""
    if index._db is None:
        raise ValueError("index not built")
    rows = np.asarray(jax.device_get(index._db))[:index._n]
    payload = {
        "dim": np.int64(index.dim),
        "n": np.int64(index._n),
        "quantize": np.bool_(index.quantize),
    }
    if index.quantize:
        payload["rows_int8"] = rows
        payload["row_scale"] = np.asarray(
            jax.device_get(index._db_scale))[:index._n]
    elif rows.dtype == jnp.bfloat16:
        payload["rows_bf16_bits"] = rows.view(np.uint16)
    else:
        payload["rows"] = rows
    if filenames is not None:
        payload["filenames"] = np.asarray(filenames, dtype=np.str_)
    if latlon is not None:
        payload["latlon"] = np.asarray(latlon, np.float32)
    with open(path, "wb") as f:
        np.savez(f, **payload)


def load_index(path: str, mesh: Optional[Mesh] = None, axis: str = "data"):
    """Load an index saved by `save_index`. Returns (index, meta) where meta
    holds any gallery metadata that was stored ({"filenames", "latlon"}).
    Quantized rows are installed as-is — no requantization, so save/load
    round-trips bit-exactly; sharding follows the (possibly different)
    mesh passed here."""
    with np.load(path) as z:
        dim = int(z["dim"])
        quantize = bool(z["quantize"])
        if quantize:
            rows = jnp.asarray(z["rows_int8"])
            scale = jnp.asarray(z["row_scale"])
            dtype = jnp.bfloat16
        elif "rows_bf16_bits" in z:
            rows = jnp.asarray(z["rows_bf16_bits"]).view(jnp.bfloat16)
            scale, dtype = None, jnp.bfloat16
        else:
            rows = jnp.asarray(z["rows"])
            scale, dtype = None, rows.dtype
        meta = {k: z[k] for k in ("filenames", "latlon") if k in z}
    index = DescriptorIndex(dim=dim, dtype=dtype, mesh=mesh, axis=axis,
                            quantize=quantize)
    index._install(rows, scale)
    return index, meta


def recall_at_k_radius(retrieved_idx: jax.Array, query_latlon: jax.Array,
                       gallery_latlon: jax.Array, radius: float,
                       k: int) -> jax.Array:
    """Proximity Recall@k — the standard VPR protocol (a query is solved if
    ANY of its top-k matches lies within `radius` of the true position; the
    label grid is meters-scale, SURVEY.md §0). retrieved_idx: (Q, >=k) into
    the gallery; query/gallery latlon: (Q|N, 2)."""
    cand = gallery_latlon[retrieved_idx[:, :k]]            # (Q, k, 2)
    d2 = jnp.sum((cand - query_latlon[:, None, :]) ** 2, axis=-1)
    hits = jnp.any(d2 <= radius * radius, axis=1)
    return jnp.mean(hits.astype(jnp.float32))
