"""Unrolled engine: per-shape-compiled staged renderer (render/unrolled.py).

The brute renderers are the correctness backstop (the reference's three-way
consistency protocol, /root/reference/benchmark/brute.cu:101-155); both
engines evaluate the identical unrolled float chain, so staged-vs-brute is
expected to be BIT-exact — culling must never change a pixel."""

import numpy as np
import pytest

from mpr_tpu import config, oracle
from mpr_tpu.frontend import frep, shapes
from mpr_tpu.ops import unrolled_eval as ue
from mpr_tpu.render import brute, camera, unrolled
from mpr_tpu.tape.tape import compile_tree


@pytest.fixture(scope="module")
def spheres_tape():
    t = shapes.union(shapes.sphere(0.6, cx=-0.2),
                     shapes.sphere(0.4, cx=0.5, cy=0.3))
    return compile_tree(t)


def _model_tape(name):
    t = frep.load(f"/root/reference/benchmark/files/{name}.frep")[0].tree
    return compile_tree(t)


# ---------------------------------------------------------------------------
# evaluator builders vs the NumPy oracle
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name", ["hello_world", "involute_gear_2d", "bear"])
def test_float_matches_oracle(name):
    tape = _model_tape(name)
    rng = np.random.RandomState(0)
    x, y, z = (rng.uniform(-1, 1, 1500).astype(np.float32) for _ in range(3))
    v = np.asarray(ue.build_float(tape)(x, y, z))
    vo = oracle.eval_f(tape, x, y, z)
    m = np.isfinite(vo)
    assert (np.isfinite(v) == m).all()
    np.testing.assert_allclose(v[m], vo[m], rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize("name", ["hello_world", "bear"])
def test_deriv_matches_oracle(name):
    tape = _model_tape(name)
    rng = np.random.RandomState(1)
    x, y, z = (rng.uniform(-1, 1, 1000).astype(np.float32) for _ in range(3))
    got = [np.asarray(a) for a in ue.build_deriv(tape)(x, y, z)]
    want = oracle.eval_d(tape, x, y, z)
    # bear's exp/log blend chains amplify f32 fusion-order noise
    rtol, atol = (1e-2, 1e-3) if name == "bear" else (2e-3, 2e-4)
    for k in range(4):
        m = np.isfinite(want[k]) & np.isfinite(want[0])
        np.testing.assert_allclose(got[k][m], want[k][m], rtol=rtol,
                                   atol=atol)


@pytest.mark.parametrize("name", ["hello_world", "involute_gear_2d",
                                  "architecture"])
def test_interval_soundness(name):
    """Random point in box => f(point) in interval(box) (SURVEY.md §4).
    bear is excluded: the REFERENCE log quirk itself is unsound there
    (interval_math.i_log docstring), which the oracle test suite already
    pins."""
    tape = _model_tape(name)
    fi = ue.build_interval(tape)
    rng = np.random.RandomState(2)
    c = rng.uniform(-1, 1, (3, 400)).astype(np.float32)
    w = rng.uniform(0, 0.3, (3, 400)).astype(np.float32)
    lo, hi = (np.asarray(a) for a in fi(c[0] - w[0], c[0] + w[0],
                                        c[1] - w[1], c[1] + w[1],
                                        c[2] - w[2], c[2] + w[2]))
    for _ in range(10):
        u = rng.uniform(-1, 1, (3, 400)).astype(np.float32)
        p = c + u * w
        pv = oracle.eval_f(tape, p[0], p[1], p[2])
        ok = (~np.isfinite(pv) | ~np.isfinite(lo) | ~np.isfinite(hi)
              | ((pv >= lo - 1e-4) & (pv <= hi + 1e-4)))
        assert ok.all()


def test_interval_classification_matches_oracle():
    """Same empty/filled/ambiguous decisions as the oracle interpreter."""
    tape = _model_tape("bear")
    fi = ue.build_interval(tape)
    rng = np.random.RandomState(3)
    c = rng.uniform(-1, 1, (3, 500)).astype(np.float32)
    w = rng.uniform(0, 0.4, (3, 500)).astype(np.float32)
    args = [c[0] - w[0], c[0] + w[0], c[1] - w[1], c[1] + w[1],
            c[2] - w[2], c[2] + w[2]]
    lo_u, hi_u = (np.asarray(a) for a in fi(*args))
    lo_o, hi_o, _ = oracle.eval_i(tape, *args)

    def cls(lo, hi):
        return np.where(lo > 0, 0, np.where(hi < 0, 1, 2))
    # unrolled may be (rarely) wider, never unsoundly narrower: any
    # disagreement must classify ambiguous on the unrolled side
    cu, co = cls(lo_u, hi_u), cls(lo_o, hi_o)
    diff = cu != co
    assert (cu[diff] == 2).all()
    assert diff.mean() < 0.02


def test_tight_sincos_flag():
    """config.tight_sincos flips sin/cos intervals from the reference quirk
    (always [-1,1], /root/reference/inc/gpu_interval.hpp:346-380) to tight
    ranges; cross-checked oracle vs unrolled (SURVEY.md §7 quirk list)."""
    from mpr_tpu.frontend import tree as T
    tape = compile_tree(T.sin(T.x()))
    xl = np.asarray([0.1, 0.0], np.float32)
    xh = np.asarray([0.2, 7.0], np.float32)
    yl = yh = zl = zh = np.zeros(2, np.float32)
    # quirk mode: always [-1, 1]
    lo, hi, _ = oracle.eval_i(tape, xl, xh, yl, yh, zl, zh)
    np.testing.assert_allclose(lo, -1.0)
    np.testing.assert_allclose(hi, 1.0)
    with config.override(tight_sincos=True):
        lo, hi, _ = oracle.eval_i(tape, xl, xh, yl, yh, zl, zh)
        # [0.1, 0.2]: monotonic -> endpoint values
        np.testing.assert_allclose(lo[0], np.sin(0.1), rtol=1e-6)
        np.testing.assert_allclose(hi[0], np.sin(0.2), rtol=1e-6)
        # [0, 7] contains both extrema
        np.testing.assert_allclose(lo[1], -1.0)
        np.testing.assert_allclose(hi[1], 1.0)
        fi = ue.build_interval(tape)
        lo_u, hi_u = (np.asarray(a) for a in
                      fi(xl, xh, yl, yh, zl, zh))
        np.testing.assert_allclose(lo_u, lo, rtol=1e-6)
        np.testing.assert_allclose(hi_u, hi, rtol=1e-6)


# ---------------------------------------------------------------------------
# staged renders vs brute (bit-exact)
# ---------------------------------------------------------------------------

def test_render2d_circle_exact():
    tape = compile_tree(shapes.circle(0.7))
    assert (unrolled.render2d(tape, size=256)
            == brute.render2d_brute(tape, size=256)).all()


@pytest.mark.parametrize(
    "name", ["hello_world",
             pytest.param("involute_gear_2d", marks=pytest.mark.slow)])
def test_render2d_models_exact(name):
    # gear is slow-marked: XLA:CPU's optimizer takes >5 min on its ~25k-op
    # unrolled pipeline graph (any optimization level; TPU compiles are
    # amortized by the persistent cache, CPU test runs are not)
    tape = _model_tape(name)
    assert (unrolled.render2d(tape, size=256)
            == brute.render2d_brute(tape, size=256)).all()


def test_render2d_camera_exact():
    tape = _model_tape("hello_world")
    mat = camera.scale2(0.6)
    mat[0, 2] = 0.2
    assert (unrolled.render2d(tape, mat=mat, size=256)
            == brute.render2d_brute(tape, mat=mat, size=256)).all()


def test_render3d_spheres_exact(spheres_tape):
    d_u, n_u = unrolled.render3d(spheres_tape, size=128)
    d_b = brute.render3d_brute(spheres_tape, size=128)
    assert (d_u == d_b).all()
    assert np.isfinite(n_u).all()
    # filled pixels carry unit normals, empty pixels zero
    filled = d_u > 0
    norms = np.linalg.norm(n_u, axis=-1)
    np.testing.assert_allclose(norms[filled], 1.0, atol=1e-5)
    assert (norms[~filled] == 0).all()


def test_render3d_rotated_exact(spheres_tape):
    m = camera.gui3d_view()
    d_u, _ = unrolled.render3d(spheres_tape, mat=m, size=128,
                               with_normals=False)
    assert (d_u == brute.render3d_brute(spheres_tape, mat=m,
                                        size=128)).all()


def test_render3d_normals_point_outward(spheres_tape):
    d, n = unrolled.render3d(spheres_tape, size=128)
    # the big sphere's center column: normal should be ~ +z toward viewer
    cy, cx = 64, int((0.8 / 2) * 128)  # x = -0.2 -> px ~ 51
    assert d[cy, cx] > 0
    assert n[cy, cx, 2] > 0.9


def test_overflow_retry_never_drops_geometry(spheres_tape):
    """Force tiny caps via the observation cache: the retry loop must grow
    them and still produce the exact image (the reference's
    realloc-on-overflow invariant, /root/reference/src/context.cu:1219)."""
    r = unrolled.UnrolledRenderer(spheres_tape)
    r._obs[("3d", 128)] = (1, 1, 1, 1)   # absurdly small -> guaranteed overflow
    d_u, _ = r.render3d(size=128, with_normals=False)
    assert (d_u == brute.render3d_brute(spheres_tape, size=128)).all()
    r._obs[("2d", 128)] = (1, 1)
    img = r.render2d(size=128)
    assert (img == brute.render2d_brute(spheres_tape, size=128)).all()


def test_render2d_grad_through_pipeline():
    """d(pixel values)/d(imms) through the unrolled evaluator matches the
    scan interpreter's gradients (BASELINE pixel-gradient requirement)."""
    import jax
    import jax.numpy as jnp
    from mpr_tpu.ops import eval_scan
    from mpr_tpu.ops.tape_data import TapeData

    tape = compile_tree(shapes.circle(0.55))
    f = ue.build_float(tape, take_imms=True)
    td = TapeData.from_tape(tape)
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.uniform(-1, 1, 64).astype(np.float32))
    y = jnp.asarray(rng.uniform(-1, 1, 64).astype(np.float32))
    z = jnp.zeros_like(x)

    g_unrolled = jax.grad(
        lambda im_: jnp.sum(f(x, y, z, im_) ** 2))(jnp.asarray(tape.imms))

    def loss_scan(im_):
        padded = jnp.zeros((td.capacity,), jnp.float32).at[
            :tape.length].set(im_)
        return jnp.sum(eval_scan.eval_f(td.replace_imms(padded),
                                        x, y, z) ** 2)
    g_scan = jax.grad(loss_scan)(jnp.asarray(tape.imms))
    np.testing.assert_allclose(np.asarray(g_unrolled), np.asarray(g_scan),
                               rtol=1e-4, atol=1e-5)


def test_render3d_skip4_exact(spheres_tape):
    """The adaptive no-4^3-stage variant (picked for interval-hostile
    models) must also be bit-exact vs brute."""
    r = unrolled.UnrolledRenderer(spheres_tape)
    r._obs[("3d", 128)] = (8, 30, 1920, 4)   # far above the skip threshold
    assert r._skip4(128)
    d_u, _ = r.render3d(size=128, with_normals=False)
    assert (d_u == brute.render3d_brute(spheres_tape, size=128)).all()


@pytest.mark.parametrize("name", [
    # prospero's 5435-clause grad graph costs ~3 min of XLA:CPU compile
    # alone; the three smaller models cover the same property per run
    pytest.param("prospero", marks=pytest.mark.slow),
    "involute_gear_2d", "architecture", "bear"])
def test_pixel_gradients_match_scan(name):
    """BASELINE.md: d(pixels)/d(tape constants) allclose on the paper
    models — the unrolled engine's pixel stage (take_imms) against the
    scan interpreter's autodiff, at pixel centers of a coarse grid."""
    import jax
    import jax.numpy as jnp
    from mpr_tpu.ops import eval_scan
    from mpr_tpu.ops.tape_data import TapeData

    tape = _model_tape(name)
    f = ue.build_float(tape, take_imms=True)
    td = TapeData.from_tape(tape)
    p = (np.arange(24, dtype=np.float32) + 0.5) / 24 * 2 - 1
    X, Y = np.meshgrid(p, p)
    x = jnp.asarray(X.ravel())
    y = jnp.asarray(Y.ravel())
    z = jnp.zeros_like(x) if name in ("prospero", "involute_gear_2d") \
        else jnp.asarray(np.tile(p, 24))
    # weight surface-region pixels (finite, |f| small); out-of-domain
    # pixels produce NaN cotangents through dead sqrt/log branches in
    # BOTH engines identically — the parity claim is about valid pixels
    v0 = np.asarray(f(x, y, z, jnp.asarray(tape.imms)))
    sel = np.isfinite(v0) & (np.abs(v0) < 2.0)
    assert sel.mean() > 0.15
    w = jnp.asarray((np.random.RandomState(7).uniform(
        0.5, 1.0, x.shape[0]) * sel).astype(np.float32))

    g_u = jax.grad(lambda im_: jnp.sum(f(x, y, z, im_) * w))(
        jnp.asarray(tape.imms))

    def loss_scan(im_):
        padded = jnp.zeros((td.capacity,), jnp.float32).at[
            :tape.length].set(im_)
        return jnp.sum(eval_scan.eval_f(td.replace_imms(padded),
                                        x, y, z) * w)
    g_s = jax.grad(loss_scan)(jnp.asarray(tape.imms))
    gu, gs = np.asarray(g_u), np.asarray(g_s)
    # identical NaN patterns, allclose on the finite set
    assert (np.isfinite(gu) == np.isfinite(gs)).all()
    m = np.isfinite(gs)
    assert m.sum() > 100
    np.testing.assert_allclose(gu[m], gs[m], rtol=5e-4,
                               atol=np.abs(gs[m]).max() * 1e-5)


def test_snug_cap_tier(spheres_tape):
    """Steady-state cap policy: after the same counts are observed on
    consecutive frames, caps drop from the 1.25-geometric buckets to
    snug (count*1.03 + align-256) — and a drifting count resets to the
    bucketed tier.  Renders must stay exact either way."""
    r = unrolled.UnrolledRenderer(spheres_tape)
    r._obs.clear(); r._hits.clear()
    want = brute.render2d_brute(spheres_tape, size=128)
    img1 = r.render2d(size=128)                 # heuristic caps
    img2 = r.render2d(size=128)                 # bucketed (hits=1)
    assert not r._snug(("2d", 128))
    img3 = r.render2d(size=128)                 # hits=2 -> snug next
    assert r._snug(("2d", 128))
    caps_snug = r._caps2d(128)
    img4 = r.render2d(size=128)                 # rendered at snug caps
    for img in (img1, img2, img3, img4):
        assert (img == want).all()
    a64, a8 = r._obs[("2d", 128)]
    assert caps_snug[0] <= max(64, -(-(int(a64 * 1.03) + 17) // 256) * 256)
    # a drifted count resets the stability streak
    r._record(("2d", 128), (a64 + max(64, a64), a8))
    assert not r._snug(("2d", 128))


def test_renderer_cache_keyed_by_config(spheres_tape):
    """config.override of a semantic flag must not reuse a renderer
    traced under the other semantics: the unrolled evaluators latch
    tight_sincos/fast_transcendentals at build time, so tape_key folds
    them in and get_renderer returns a per-config instance."""
    r_default = unrolled.get_renderer(spheres_tape)
    with config.override(tight_sincos=True):
        r_tight = unrolled.get_renderer(spheres_tape)
        assert r_tight is not r_default
        assert unrolled.get_renderer(spheres_tape) is r_tight
    assert unrolled.get_renderer(spheres_tape) is r_default


def test_obs_persisted_only_on_change(spheres_tape, monkeypatch):
    """Steady-state frames must not rewrite the obs json every call —
    the host loop of a sub-ms frame cannot afford a disk write."""
    from mpr_tpu.utils import compcache
    calls = []
    monkeypatch.setattr(compcache, "save_obs",
                        lambda key, obs, hits=None: calls.append(len(obs)))
    r = unrolled.UnrolledRenderer(spheres_tape)
    r._obs.clear(); r._hits.clear()
    r.render2d(size=128)
    n_after_first = len(calls)
    assert n_after_first >= 1          # first observation is persisted
    r.render2d(size=128)
    r.render2d(size=128)               # hits reaches 2: ONE snug-tier write
    n_after_snug = len(calls)
    assert n_after_snug <= n_after_first + 1
    r.render2d(size=128)
    r.render2d(size=128)               # steady state: no per-frame writes
    assert len(calls) == n_after_snug


def test_render2d_slab_composition(spheres_tape):
    """The slab-parameterized ladder (multi-chip unit) composes exactly:
    rendering each 64px tile-row slab separately and stacking equals the
    whole-image render."""
    import jax.numpy as jnp
    from mpr_tpu.render.unrolled import _render2d_impl
    r = unrolled.UnrolledRenderer(spheres_tape)
    size = 128
    full = r.render2d(size=size)
    n64 = size // 64
    mat = jnp.asarray(camera.identity2())
    z = jnp.float32(0.0)
    p64, p8 = r._caps2d(size)
    slabs = []
    for row in range(n64):
        img, cnt = _render2d_impl(r.fi, r.f, mat, z, size, p64, p8,
                                  r0=row, rows64=1)
        assert img.shape == (64, size)
        slabs.append(np.asarray(img))
    assert (np.concatenate(slabs, axis=0) == full).all()


def test_render3d_slab_composition(spheres_tape):
    """The slab-parameterized 3D ladder composes exactly: per-slab
    depth/normals stacked equal the whole-image render (occlusion is
    per-xy-column, so slabs are independent by construction)."""
    import jax.numpy as jnp
    from mpr_tpu.render.unrolled import _render3d_impl
    r = unrolled.UnrolledRenderer(spheres_tape)
    size = 128
    d_full, n_full = r.render3d(size=size)
    n64 = size // 64
    mat = jnp.asarray(camera.identity3())
    p0, c1, c2, c2a, c2b, pn = r._caps3d(size)
    dslabs, nslabs = [], []
    for row in range(n64):
        d, nrm, cnt = _render3d_impl(r.fi, r.f, r.fd, mat, size, p0, c1,
                                     c2, pn, True, False, r0=row, rows=1,
                                     c2a=c2a, c2b=c2b)
        assert d.shape == (64, size)
        dslabs.append(np.asarray(d))
        nslabs.append(np.asarray(nrm))
    assert (np.concatenate(dslabs, axis=0) == d_full).all()
    n_cat = np.concatenate(nslabs, axis=0)
    m = d_full > 0
    np.testing.assert_allclose(n_cat[m], n_full[m], atol=1e-6)


# ---------------------------------------------------------------------------
# imm-input mode: immediates as runtime inputs (structural executables)
# ---------------------------------------------------------------------------

def test_imm_inputs_matches_baked(spheres_tape):
    """imm-input renderers run the identical arithmetic — images must be
    bit-equal to the baked-constant engine on both ladders."""
    rb = unrolled.get_renderer(spheres_tape)
    ri = unrolled.get_renderer(spheres_tape, imm_inputs=True)
    assert ri is not rb
    assert (rb.render2d(size=128) == ri.render2d(size=128)).all()
    db, nb = rb.render3d(size=128)
    di, ni = ri.render3d(size=128)
    assert (db == di).all()
    np.testing.assert_array_equal(nb, ni)


def test_imm_override_matches_recompile():
    """render(imms=...) on a structural executable must equal a fresh
    compile of the edited tape — the no-recompile contract of viewer
    sliders / cli --set on the production engine."""
    t_a = compile_tree(shapes.circle(0.62))
    t_b = compile_tree(shapes.circle(0.31))
    assert unrolled.tape_key(t_a, True) == unrolled.tape_key(t_b, True)
    r = unrolled.get_renderer(t_a, imm_inputs=True)
    want = brute.render2d_brute(t_b, size=128)
    got = r.render2d(size=128, imms=t_b.imms)
    assert (got == want).all()
    # and the structural renderer cache hands back the same instance
    assert unrolled.get_renderer(t_b, imm_inputs=True) is r


def test_imm_override_rejected_when_baked(spheres_tape):
    r = unrolled.get_renderer(spheres_tape)
    with pytest.raises(ValueError, match="imm_inputs"):
        r.render2d(size=128, imms=spheres_tape.imms)


def test_imm_inputs_sharded_matches(spheres_tape):
    """The replicated-imms path through shard_map (1x1 mesh here; the
    virtual 8-device mesh is covered by test_parallel.py)."""
    from mpr_tpu.parallel.sharded import make_mesh
    mesh = make_mesh(n_devices=1)
    ri = unrolled.get_renderer(spheres_tape, imm_inputs=True)
    a = ri.render2d(size=128)
    b = ri.render2d_sharded(size=128, mesh=mesh)
    assert (a == b).all()


def test_two_phase_voxel_stage_exact(spheres_tape):
    """The front-to-back two-phase voxel stage (default off; measured a
    wash on the paper models, docs/perf_notes.md round-4) must stay
    BIT-exact vs the single-phase ladder — its per-column-min re-cull is
    only allowed to skip cells that cannot contain any pixel's surface."""
    r = unrolled.UnrolledRenderer(spheres_tape)
    r._obs.clear(); r._hits.clear()
    r.two_phase = False
    d1, n1 = r.render3d(size=128)
    r.two_phase = True
    d2, n2 = r.render3d(size=128)
    assert (d1 == d2).all()
    np.testing.assert_array_equal(n1, n2)
