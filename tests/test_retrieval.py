"""Retrieval: cosine top-k, Recall@k, and sharded index search on the
8-device CPU mesh (exact parity between sharded and single-device search)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from geovpr.parallel import create_mesh
from geovpr.retrieval import DescriptorIndex, cosine_topk, recall_at_k


def _unit(rng, n, d):
    x = rng.normal(size=(n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_cosine_topk_exact():
    rng = np.random.default_rng(0)
    db = _unit(rng, 100, 32)
    q = _unit(rng, 5, 32)
    scores, idx = cosine_topk(jnp.array(q), jnp.array(db), k=3)
    ref = q @ db.T
    ref_idx = np.argsort(-ref, axis=1)[:, :3]
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    np.testing.assert_allclose(np.asarray(scores),
                               np.take_along_axis(ref, ref_idx, 1), atol=1e-5)


def test_self_retrieval_recall1():
    rng = np.random.default_rng(1)
    db = _unit(rng, 64, 128)
    index = DescriptorIndex(dim=128, dtype=jnp.float32).build(db)
    _, idx = index.search(jnp.array(db), k=5)
    r1 = recall_at_k(idx, jnp.arange(64), k=1)
    assert float(r1) == 1.0


def test_sharded_matches_unsharded():
    rng = np.random.default_rng(2)
    db = _unit(rng, 103, 64)  # deliberately not divisible by 8 -> padding
    q = _unit(rng, 7, 64)
    mesh = create_mesh()
    sharded = DescriptorIndex(dim=64, dtype=jnp.float32, mesh=mesh).build(db)
    plain = DescriptorIndex(dim=64, dtype=jnp.float32).build(db)
    s1, i1 = sharded.search(jnp.array(q), k=4)
    s2, i2 = plain.search(jnp.array(q), k=4)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-5)


@pytest.mark.parametrize("quantize", [False, True])
@pytest.mark.parametrize("use_mesh", [False, True])
def test_build_chunked_matches_build(quantize, use_mesh):
    """Streaming chunked build (the only way a 1M x 8448 gallery can be
    built — the f32 array would be 33.8 GB) must produce bit-identical
    search results to the one-shot build, on and off the mesh, quantized
    and not, including a ragged final chunk."""
    rng = np.random.default_rng(7)
    db = _unit(rng, 100, 32)
    q = _unit(rng, 9, 32)
    mesh = create_mesh() if use_mesh else None
    one = DescriptorIndex(dim=32, dtype=jnp.float32, mesh=mesh,
                          quantize=quantize).build(db)
    chunks = [db[0:40], db[40:80], db[80:100]]   # ragged tail
    chunked = DescriptorIndex(dim=32, dtype=jnp.float32, mesh=mesh,
                              quantize=quantize).build_chunked(chunks, 100)
    s1, i1 = one.search(jnp.array(q), k=5)
    s2, i2 = chunked.search(jnp.array(q), k=5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)


def test_build_chunked_row_count_mismatch_raises():
    rng = np.random.default_rng(8)
    db = _unit(rng, 20, 16)
    idx = DescriptorIndex(dim=16, dtype=jnp.float32)
    with pytest.raises(ValueError, match="expected total"):
        idx.build_chunked([db[:10]], 20)
    with pytest.raises(ValueError, match="exceed"):
        idx.build_chunked([db, db], 20)


def test_bf16_index_recall():
    rng = np.random.default_rng(3)
    db = _unit(rng, 256, 64)
    index = DescriptorIndex(dim=64, dtype=jnp.bfloat16).build(db)
    # perturb queries slightly; bf16 rounding must not break top-1 retrieval
    q = db + 0.001 * rng.normal(size=db.shape).astype(np.float32)
    _, idx = index.search(jnp.array(q), k=1)
    r1 = recall_at_k(idx, jnp.arange(256), k=1)
    assert float(r1) > 0.99


def test_dim_mismatch_raises():
    with pytest.raises(ValueError):
        DescriptorIndex(dim=64).build(np.zeros((4, 32), np.float32))


def test_recall_at_k_hand_values():
    idx = jnp.array([[0, 1, 2], [5, 4, 3], [9, 8, 7]])
    pos = jnp.array([2, 4, 0])
    assert float(recall_at_k(idx, pos, k=1)) == pytest.approx(0.0)
    assert float(recall_at_k(idx, pos, k=2)) == pytest.approx(1 / 3)
    assert float(recall_at_k(idx, pos, k=3)) == pytest.approx(2 / 3)


class TestShardedPaddingMask:
    def test_padded_rows_never_outrank_negative_matches(self):
        """Gallery of 5 rows over 8 shards forces zero-padding; with
        all-negative cosine scores the padded rows' raw 0 score would win
        without the -inf mask."""
        from geovpr.parallel import create_mesh
        from geovpr.retrieval.index import DescriptorIndex

        rng = np.random.default_rng(0)
        base = rng.normal(size=(1, 16)).astype(np.float32)
        base /= np.linalg.norm(base)
        # gallery vectors all NEGATIVELY correlated with the query
        gallery = -np.abs(rng.uniform(0.2, 1.0, (5, 1))).astype(np.float32) \
            * base + rng.normal(0, 1e-3, (5, 16)).astype(np.float32)
        index = DescriptorIndex(dim=16, mesh=create_mesh(),
                                dtype=jnp.float32).build(
            jnp.asarray(gallery), normalized=False)
        scores, idx = index.search(jnp.asarray(base), k=3)
        idx = np.asarray(idx)
        assert (idx < 5).all(), f"padded row leaked into top-k: {idx}"
        assert (np.asarray(scores) < 0).all()


class TestRebuildInvalidatesCache:
    def test_rebuild_with_different_size_returns_fresh_results(self):
        """Round-2 regression: the compiled sharded searchers bake in the
        build-time n_real/shard_rows; a rebuild with a different database
        size must not reuse them (stale shard offsets / padded-row masks
        silently return wrong neighbors)."""
        rng = np.random.default_rng(5)
        mesh = create_mesh()
        index = DescriptorIndex(dim=32, dtype=jnp.float32, mesh=mesh)
        q = jnp.array(_unit(rng, 6, 32))

        db1 = _unit(rng, 50, 32)
        index.build(db1)
        index.search(q, k=4)  # populate the k=4 cache for the 50-row build

        db2 = _unit(rng, 201, 32)  # different size -> different shard_rows
        index.build(db2)
        s, i = index.search(q, k=4)
        plain = DescriptorIndex(dim=32, dtype=jnp.float32).build(db2)
        s_ref, i_ref = plain.search(q, k=4)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
        np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), atol=1e-5)


class TestQuantizedIndex:
    """int8 database quantization: per-row symmetric PTQ after L2
    normalization, int8 x int8 -> int32 score matmul, rank-1 scale
    restore (DescriptorIndex(quantize=True))."""

    def test_scores_match_f32_within_rounding(self):
        rng = np.random.default_rng(7)
        db = _unit(rng, 128, 256)
        q = _unit(rng, 9, 256)
        qi = DescriptorIndex(dim=256, quantize=True).build(db)
        fi = DescriptorIndex(dim=256, dtype=jnp.float32).build(db)
        s_q, _ = qi.search(jnp.array(q), k=5)
        s_f, _ = fi.search(jnp.array(q), k=5)
        # per-component rounding is <= 1/254 of the row amax; at D=256 the
        # accumulated inner-product error stays well under 1e-2
        np.testing.assert_allclose(np.asarray(s_q), np.asarray(s_f),
                                   atol=1e-2)

    def test_top1_recall_survives_quantization(self):
        rng = np.random.default_rng(8)
        db = _unit(rng, 512, 128)
        q = db + 0.02 * rng.normal(size=db.shape).astype(np.float32)
        index = DescriptorIndex(dim=128, quantize=True).build(db)
        _, idx = index.search(jnp.array(q), k=1)
        r1 = recall_at_k(idx, jnp.arange(512), k=1)
        assert float(r1) > 0.99

    def test_sharded_quantized_matches_unsharded(self):
        rng = np.random.default_rng(9)
        db = _unit(rng, 103, 64)  # not divisible by 8 -> padded rows
        q = _unit(rng, 7, 64)
        mesh = create_mesh()
        sharded = DescriptorIndex(dim=64, mesh=mesh, quantize=True).build(db)
        plain = DescriptorIndex(dim=64, quantize=True).build(db)
        s1, i1 = sharded.search(jnp.array(q), k=4)
        s2, i2 = plain.search(jnp.array(q), k=4)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-5)

    def test_save_load_roundtrip_bitexact(self, tmp_path):
        """save_index/load_index: quantized rows+scales reload verbatim (no
        requantization), searches match the original index exactly, and the
        gallery metadata rides along."""
        from geovpr.retrieval.index import load_index, save_index

        rng = np.random.default_rng(11)
        db = _unit(rng, 57, 96)
        q = _unit(rng, 4, 96)
        names = [f"img_{i:04d}.jpg" for i in range(57)]
        latlon = rng.uniform(0, 100, (57, 2)).astype(np.float32)
        index = DescriptorIndex(dim=96, quantize=True).build(db)
        path = str(tmp_path / "gallery.npz")
        save_index(index, path, filenames=names, latlon=latlon)

        loaded, meta = load_index(path)
        assert loaded.size == 57 and loaded.quantize
        assert list(meta["filenames"]) == names
        np.testing.assert_array_equal(meta["latlon"], latlon)
        s1, i1 = index.search(jnp.array(q), k=5)
        s2, i2 = loaded.search(jnp.array(q), k=5)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))

    def test_save_load_bf16_and_onto_mesh(self, tmp_path):
        """bf16 rows survive the uint16 bit-pattern trip, and an index saved
        unsharded can be loaded onto a different topology (the 8-device
        mesh) with identical results."""
        from geovpr.retrieval.index import load_index, save_index

        rng = np.random.default_rng(12)
        db = _unit(rng, 41, 64)   # not divisible by 8 -> padding on load
        q = _unit(rng, 3, 64)
        index = DescriptorIndex(dim=64, dtype=jnp.bfloat16).build(db)
        path = str(tmp_path / "gallery_bf16.npz")
        save_index(index, path)

        loaded, meta = load_index(path, mesh=create_mesh())
        assert meta == {}
        s1, i1 = index.search(jnp.array(q), k=4)
        s2, i2 = loaded.search(jnp.array(q), k=4)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                                   atol=1e-5)

    def test_quantized_padded_rows_never_leak(self):
        rng = np.random.default_rng(10)
        base = rng.normal(size=(1, 16)).astype(np.float32)
        base /= np.linalg.norm(base)
        gallery = -np.abs(rng.uniform(0.2, 1.0, (5, 1))).astype(np.float32) \
            * base + rng.normal(0, 1e-3, (5, 16)).astype(np.float32)
        index = DescriptorIndex(dim=16, mesh=create_mesh(),
                                quantize=True).build(
            jnp.asarray(gallery), normalized=False)
        scores, idx = index.search(jnp.asarray(base), k=3)
        idx = np.asarray(idx)
        assert (idx < 5).all(), f"padded row leaked into top-k: {idx}"
        assert (np.asarray(scores) < 0).all()

class TestQueryChunking:
    """`query_chunk`: search scans over static query blocks so only one
    (chunk, shard_rows) score plane is live at a time (a 100k x 1M sweep
    would otherwise OOM HBM). Results must be identical to the unchunked
    path, including ragged final blocks."""

    def test_chunked_matches_unchunked_plain(self):
        rng = np.random.default_rng(20)
        db = _unit(rng, 97, 48)
        q = _unit(rng, 53, 48)  # 53 = 3*16 + 5 -> ragged last block
        a = DescriptorIndex(dim=48, dtype=jnp.float32,
                            query_chunk=16).build(db)
        b = DescriptorIndex(dim=48, dtype=jnp.float32,
                            query_chunk=0).build(db)
        s1, i1 = a.search(jnp.array(q), k=5)
        s2, i2 = b.search(jnp.array(q), k=5)
        assert s1.shape == (53, 5)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)

    def test_chunked_matches_unchunked_sharded_quantized(self):
        rng = np.random.default_rng(21)
        db = _unit(rng, 103, 64)
        q = _unit(rng, 37, 64)
        mesh = create_mesh()
        a = DescriptorIndex(dim=64, mesh=mesh, quantize=True,
                            query_chunk=8).build(db)
        b = DescriptorIndex(dim=64, mesh=mesh, quantize=True,
                            query_chunk=0).build(db)
        s1, i1 = a.search(jnp.array(q), k=4)
        s2, i2 = b.search(jnp.array(q), k=4)
        assert s1.shape == (37, 4)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-5)

    def test_query_count_below_chunk_is_single_shot(self):
        rng = np.random.default_rng(22)
        db = _unit(rng, 64, 32)
        q = _unit(rng, 5, 32)
        idx = DescriptorIndex(dim=32, dtype=jnp.float32,
                              query_chunk=1024).build(db)
        s, i = idx.search(jnp.array(q), k=3)
        ref = DescriptorIndex(dim=32, dtype=jnp.float32,
                              query_chunk=0).build(db)
        s2, i2 = ref.search(jnp.array(q), k=3)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i2))


class TestKLargerThanShardRows:
    """k may exceed a shard's row count (local_k truncates to shard_rows;
    the n_shards*local_k gathered candidates still cover the global top-k
    by pigeonhole). Previously argued correct in a comment, untested."""

    def test_k_exceeds_shard_rows_matches_plain(self):
        rng = np.random.default_rng(23)
        db = _unit(rng, 40, 32)  # 8 shards x 5 rows
        q = _unit(rng, 6, 32)
        mesh = create_mesh()
        sharded = DescriptorIndex(dim=32, dtype=jnp.float32,
                                  mesh=mesh).build(db)
        plain = DescriptorIndex(dim=32, dtype=jnp.float32).build(db)
        s1, i1 = sharded.search(jnp.array(q), k=12)  # 12 > shard_rows=5
        s2, i2 = plain.search(jnp.array(q), k=12)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)

    def test_k_exceeds_shard_rows_quantized_with_padding(self):
        rng = np.random.default_rng(24)
        db = _unit(rng, 37, 32)  # pads to 40: shard_rows=5, 3 padded rows
        q = _unit(rng, 4, 32)
        mesh = create_mesh()
        sharded = DescriptorIndex(dim=32, mesh=mesh, quantize=True).build(db)
        plain = DescriptorIndex(dim=32, quantize=True).build(db)
        s1, i1 = sharded.search(jnp.array(q), k=20)
        s2, i2 = plain.search(jnp.array(q), k=20)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        assert (np.asarray(i1) < 37).all()


class TestInt8RankStabilityProductionDim:
    """int8 rank stability at the production descriptor width (D=8448,
    SALAD: 64x128 + 256 global token) with CLUSTERED descriptors — the
    realistic hard case where within-cluster margins are small and per-row
    int8 rounding could flip ranks."""

    def test_top1_parity_d8448_clustered(self):
        rng = np.random.default_rng(25)
        n_clusters, per = 16, 12
        centers = rng.normal(size=(n_clusters, 8448)).astype(np.float32)
        # tight clusters: 15% relative noise keeps within-cluster cosines
        # ~0.97-0.99, far closer than cross-cluster (~0)
        db = np.repeat(centers, per, axis=0) + 0.15 * rng.normal(
            size=(n_clusters * per, 8448)).astype(np.float32)
        db /= np.linalg.norm(db, axis=1, keepdims=True)
        # queries: a fresh perturbation of each database row
        q = db + 0.05 * rng.normal(size=db.shape).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)

        fi = DescriptorIndex(dim=8448, dtype=jnp.float32).build(db)
        qi = DescriptorIndex(dim=8448, quantize=True).build(db)
        sf, idx_f = fi.search(jnp.array(q), k=5)
        sq, idx_q = qi.search(jnp.array(q), k=5)
        sf, sq = np.asarray(sf), np.asarray(sq)
        idx_f, idx_q = np.asarray(idx_f), np.asarray(idx_q)

        # quantized scores track f32 inner products to ~5e-4 at D=8448
        # (per-component rounding <= 1/254 of row amax, averaging out over
        # 8448 accumulations)
        err_bound = 1e-3
        np.testing.assert_allclose(sq, sf, atol=err_bound)

        # rank stability: int8 may only reorder within the quantization
        # noise band. Every top-1 flip must be a genuine near-tie — the f32
        # top1-top2 margin below the score-error bound — never a real
        # margin crossed (measured: flips 6/192, all margins <= 2.6e-4
        # vs max score error 5.2e-4)
        flip = idx_q[:, 0] != idx_f[:, 0]
        assert flip.mean() < 0.05, f"too many flips: {flip.sum()}/{len(q)}"
        margins = sf[:, 0] - sf[:, 1]
        assert (margins[flip] < err_bound).all(), \
            f"int8 flipped a real margin: {margins[flip].max()}"
        # and the flipped top-1 stays in the query's own cluster — the
        # retrieval SEMANTICS (place recognition) are preserved even when
        # the specific same-place image reorders
        q_cluster = np.arange(len(q)) // per
        assert (idx_q[flip, 0] // per == q_cluster[flip]).all()


class TestBlockedTopk:
    """Round-5 two-stage blocked top-k (`chunk_topk` with db_block): per
    db-row-block top-k under lax.map + one merge top-k — exact by
    pigeonhole (every true global top-k entry is in its own block's
    top-k), so results must be identical to the single-shot path,
    including a non-multiple row tail and negative scores."""

    @pytest.mark.parametrize("quantize", [False, True])
    @pytest.mark.parametrize("db_block", [16, 37, 64])
    def test_blocked_matches_single_shot(self, quantize, db_block):
        rng = np.random.default_rng(11)
        db = _unit(rng, 101, 32)          # 101 % block != 0 -> tail block
        q = _unit(rng, 9, 32)
        plain = DescriptorIndex(dim=32, dtype=jnp.float32,
                                quantize=quantize, db_block=0).build(db)
        blocked = DescriptorIndex(dim=32, dtype=jnp.float32,
                                  quantize=quantize,
                                  db_block=db_block).build(db)
        s1, i1 = plain.search(jnp.array(q), k=7)
        s2, i2 = blocked.search(jnp.array(q), k=7)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                                   atol=1e-6)

    @pytest.mark.parametrize("quantize", [False, True])
    def test_blocked_sharded_matches_plain(self, quantize):
        from geovpr.parallel import create_mesh
        rng = np.random.default_rng(12)
        db = _unit(rng, 103, 32)          # padding on the 8-shard mesh
        q = _unit(rng, 5, 32)
        plain = DescriptorIndex(dim=32, dtype=jnp.float32,
                                quantize=quantize, db_block=0).build(db)
        sharded = DescriptorIndex(dim=32, dtype=jnp.float32, db_block=5,
                                  quantize=quantize,
                                  mesh=create_mesh()).build(db)
        s1, i1 = plain.search(jnp.array(q), k=4)
        s2, i2 = sharded.search(jnp.array(q), k=4)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                                   atol=1e-5)

    def test_query_chunked_blocked_matches(self):
        """db_block composes with query_chunk (lax.map over query blocks
        OUTSIDE, lax.map over db blocks INSIDE)."""
        rng = np.random.default_rng(13)
        db = _unit(rng, 70, 16)
        q = _unit(rng, 23, 16)
        plain = DescriptorIndex(dim=16, dtype=jnp.float32, db_block=0,
                                query_chunk=0).build(db)
        blocked = DescriptorIndex(dim=16, dtype=jnp.float32, db_block=32,
                                  query_chunk=8).build(db)
        s1, i1 = plain.search(jnp.array(q), k=3)
        s2, i2 = blocked.search(jnp.array(q), k=3)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                                   atol=1e-6)

    def test_approx_method_top1_on_separated_gallery(self):
        """`topk_method="approx"` routes through lax.approx_max_k; on a
        well-separated gallery (self-retrieval) top-1 must still be the
        query row itself. (CPU lowers approx_max_k exactly; the recall
        tradeoff is measured on the chip — bench.py --retrieval.)"""
        rng = np.random.default_rng(14)
        db = _unit(rng, 64, 64)
        index = DescriptorIndex(dim=64, dtype=jnp.float32,
                                topk_method="approx", db_block=24).build(db)
        _, idx = index.search(jnp.array(db), k=4)
        assert float(recall_at_k(idx, jnp.arange(64), k=1)) == 1.0


class TestShardedPaddedNegativeDisplacement:
    def test_sharded_padded_negative_scores(self):
        """Round-5 regression (pre-top-k masking): with local_k < shard
        rows and a shard holding BOTH real and padded rows, a padded
        zero-score row used to displace a real negative-cosine candidate
        from that shard's local top-k (the old code masked AFTER the local
        top_k). 29 rows over 8 shards -> shard 7 = 1 real + 3 pad; k=2 <
        shard_rows=4; the best (least-negative) gallery row lives in
        shard 7."""
        from geovpr.parallel import create_mesh
        rng = np.random.default_rng(15)
        base = _unit(rng, 1, 32)
        noise = rng.normal(0, 1e-3, (29, 32)).astype(np.float32)
        mag = np.full((29, 1), -0.9, np.float32)
        mag[28] = -0.05          # globally-best match sits in shard 7
        mag[5] = -0.1
        gallery = mag * base + noise
        gallery /= np.linalg.norm(gallery, axis=1, keepdims=True)
        index = DescriptorIndex(dim=32, mesh=create_mesh(),
                                dtype=jnp.float32).build(
            jnp.asarray(gallery))
        scores, idx = index.search(jnp.asarray(base), k=2)
        ref = (gallery @ base.T)[:, 0]
        ref_top = np.argsort(-ref)[:2]
        np.testing.assert_array_equal(np.asarray(idx)[0], ref_top)
        assert (np.asarray(scores) < 0).all()


def test_sharded_approx_matches_plain_exact():
    """mesh x topk_method="approx" co-test (the knob-combination rule):
    the sharded searcher threads the approx reduction through each
    shard's chunk_topk; on CPU approx_max_k lowers exactly, so the
    sharded-approx result must equal the plain exact search, including
    padded shards."""
    from geovpr.parallel import create_mesh

    rng = np.random.default_rng(21)
    db = _unit(rng, 101, 32)              # padding on the 8-shard mesh
    q = _unit(rng, 6, 32)
    plain = DescriptorIndex(dim=32, dtype=jnp.float32).build(db)
    sharded = DescriptorIndex(dim=32, dtype=jnp.float32, quantize=True,
                              topk_method="approx", approx_recall=0.99,
                              mesh=create_mesh()).build(db)
    plain_q = DescriptorIndex(dim=32, dtype=jnp.float32,
                              quantize=True).build(db)
    s1, i1 = plain_q.search(jnp.array(q), k=4)
    s2, i2 = sharded.search(jnp.array(q), k=4)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-5)
    # and top-1 agrees with the unquantized exact search
    _, i0 = plain.search(jnp.array(q), k=1)
    np.testing.assert_array_equal(np.asarray(i0)[:, 0],
                                  np.asarray(i2)[:, 0])
