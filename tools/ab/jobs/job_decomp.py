# repl_server job: r05 frame decomposition on the REAL bounce-2 state
# (VERDICT r04 weak #3: the committed decomposition predates the sort
# restructure + rekey; re-measure every frame term at current state).
# Uses repl_setup globals: scene, cfg, bvh, R, mo/md/mtmin/mtmax
# (sorted material set), sh_o/sun_d/tmin0/sh_ts (sun any-hit set),
# pl_o/pl_d/pl_tmin/pl_tmax (flipped point set), lpos, timed, trace,
# reorder, jnp, jax.
import jax
import jax.numpy as jnp

from vulkanraytracing_tpu.core import math3d
from vulkanraytracing_tpu.env.panorama import sample_environment
from vulkanraytracing_tpu.ops.intersect import fetch_surface_attributes
from vulkanraytracing_tpu.pt import bsdf as bsdf_mod
from vulkanraytracing_tpu.pt.surface import unpack_material

_lo, _hi = trace._root_bounds(bvh)
_f32 = jnp.float32
_res = {}

# --- sort terms -------------------------------------------------------------
_res["make_order"] = timed(
    "make_order (probe cut + argsort key)",
    lambda o, d, a, b: reorder.make_order(o, d, a, b, _lo, _hi,
                                          probe=bvh.probe),
    mo, md, mtmin, mtmax)

# the riding sort as the integrator wires it from bounce 1 on: 12 core
# columns + 6 shadow columns (point-light scene), ~18 operands
_core = (mo, md, mtmin, mtmax,
         jnp.zeros((R, 3), _f32),            # irradiance
         jnp.ones((R, 3), _f32),             # throughput
         jnp.ones((R,), _f32),               # ray_pdf
         jnp.zeros((R,), jnp.uint32), jnp.zeros((R,), jnp.uint32),  # rng
         mtmax > 0, mtmax > 0,               # alive, valid
         jnp.arange(R, dtype=jnp.int32))     # ray_slot
_shadow = (sh_o, sh_ts, jnp.zeros((R, 3), _f32), ldir, sh_tp,
           jnp.zeros((R, 3), _f32))
_res["sort_wavefront_18"] = timed(
    "sort_wavefront (18 riding cols)",
    lambda o, d, a, b: reorder.sort_wavefront(
        o, d, a, b, _lo, _hi, (*_core, *_shadow), probe=bvh.probe),
    mo, md, mtmin, mtmax)

# --- traversal terms (production wiring) ------------------------------------
_res["closest_material"] = timed(
    "closest material (sorted, prod)",
    lambda o, d, a, b: trace.trace_closest(scene, cfg, o, d, a, b),
    mo, md, mtmin, mtmax)
_res["anyhit_sun"] = timed(
    "any-hit sun (phase-split, prod)",
    lambda o, d, a, b: trace.trace_any(scene, cfg, o, d, a, b),
    sh_o, sun_d, tmin0, sh_ts)
_res["anyhit_point"] = timed(
    "any-hit point flipped (prod)",
    lambda o, d, a, b: trace.trace_any(scene, cfg, o, d, a, b),
    pl_o, pl_d, pl_tmin, pl_tmax)
_res["anyhit_concat"] = timed(
    "any-hit CONCAT 2R (as the frame traces it)",
    lambda: trace.trace_any(
        scene, cfg,
        jnp.concatenate([pl_o, sh_o]), jnp.concatenate([pl_d, sun_d]),
        jnp.concatenate([pl_tmin, tmin0]),
        jnp.concatenate([pl_tmax, sh_ts])))

# --- shading terms ----------------------------------------------------------
_hit = hot_jit(lambda o, d, a, b: trace.trace_closest(scene, cfg, o, d, a, b))(
    mo, md, mtmin, mtmax)
jax.block_until_ready(_hit)


def _shade(hit, o, d):
    attrs = fetch_surface_attributes(scene.geometry, hit)
    unp = unpack_material(scene, attrs)
    return unp.surface.base_color, unp.tbn


_res["attrs_unpack"] = timed(
    "fetch attrs + unpack material", _shade, _hit, mo, md)


def _bsdf_block(hit, o, d):
    attrs = fetch_surface_attributes(scene.geometry, hit)
    unp = unpack_material(scene, attrs)
    tbn = unp.tbn
    wo = math3d.normalize(math3d.world_to_tangent(-d, tbn))
    s0 = jnp.zeros((R,), jnp.uint32)
    s1 = jnp.ones((R,), jnp.uint32)
    b, wi, pdf, s0, s1 = bsdf_mod.sample_bsdf(unp.surface, wo, s0, s1)
    wi_s = math3d.world_to_tangent(
        jnp.broadcast_to(-scene.direct_light.direction[:3], (R, 3)), tbn)
    wh_s = math3d.normalize(wo + wi_s)
    nee = bsdf_mod.evaluate_bsdf(unp.surface, wo, wi_s, wh_s)
    return b, wi, pdf, nee


_res["bsdf_sample_nee"] = timed(
    "bsdf sample + NEE eval (incl attrs)", _bsdf_block, _hit, mo, md)
_res["env_sample"] = timed(
    "environment sample (quad table)",
    lambda d: sample_environment(scene.environment, d), md)
_res["scatter_restore"] = timed(
    "pixel-order scatter restore",
    lambda x, slot: jnp.zeros_like(x).at[slot].set(x, unique_indices=True),
    jnp.zeros((R, 3), _f32), jnp.arange(R, dtype=jnp.int32))

_tot = sum(_res.values())
print("--- r05 decomposition (bounce-2 state, ms) ---", flush=True)
for k, v in sorted(_res.items(), key=lambda kv: -kv[1]):
    print(f"{k:<24s} {v * 1e3:8.1f}  ({v / _tot * 100:4.1f}%)", flush=True)
print(f"{'SUM':<24s} {_tot * 1e3:8.1f}", flush=True)
