"""DefectGAN test / inference entry point (reference:
defectGAN/test_defectgan.py:119-268).

Supports the reference's test modes:
  --metrics fid is lpips   quantitative eval vs --npz_path statistics
  --save_img_grid          per-background label-grid panels with spatial-
                           probability heat maps
  --save_img               plain translated images
  --cal_clf                discriminator classifier accuracy on real data
  --save_stats             per-class Inception activations -> .npy (mFID prep)
  --vis_style_embeds T     per-layer PCA scatter of the style-norm MLP
                           activations, T in [hidden|mean|std] (the
                           reference captures these with torch forward
                           hooks, test_defectgan.py:33-116,266-268; here
                           flax capture_intermediates does the same job)
"""
from __future__ import annotations

import sys
from pathlib import Path

import numpy as np


def _save_image(arr, path: Path):
    from PIL import Image
    arr = np.asarray(arr)
    arr = np.clip((arr + 1.0) * 127.5, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def heatmap(prob: np.ndarray) -> np.ndarray:
    """JET-style colormap of a (H, W) probability map -> (H, W, 3) in [-1,1]
    (the reference uses cv2.applyColorMap(COLORMAP_JET),
    defectgan_model.py:336-338)."""
    p = np.clip(prob, 0, 1)
    r = np.clip(1.5 - np.abs(4 * p - 3), 0, 1)
    g = np.clip(1.5 - np.abs(4 * p - 2), 0, 1)
    b = np.clip(1.5 - np.abs(4 * p - 1), 0, 1)
    return np.stack([r, g, b], axis=-1) * 2.0 - 1.0


def main(argv=None):
    import jax
    import jax.numpy as jnp
    from de_i2i_gan_tpu.config.options import (
        Options, to_defectgan_config, to_train_config)
    from de_i2i_gan_tpu.cli.train_defectgan import build_datasets
    from de_i2i_gan_tpu.data.pipeline import DataLoader, InfiniteLoader
    from de_i2i_gan_tpu.data.transforms import EvalTransform
    from de_i2i_gan_tpu.train.checkpoint import load_checkpoint
    from de_i2i_gan_tpu.train.steps import DefectGanSteps

    opt = Options("defectgan_test").parse(argv)
    cfg = to_defectgan_config(opt)
    datasets, clf_loss_type = build_datasets(
        opt, "test", EvalTransform(opt.image_size))
    tcfg = to_train_config(opt, clf_loss_type)

    steps = DefectGanSteps(cfg, tcfg)
    state = steps.init_state(jax.random.PRNGKey(opt.seed))
    name = opt.load_model_name or opt.name
    state = load_checkpoint(opt.ckpt_dir, name, opt.which_epoch, state,
                            strict=False)

    df_loader = DataLoader(datasets["defects"], opt.batch_size, seed=opt.seed)
    bg_loader = InfiniteLoader(DataLoader(datasets["background"],
                                          opt.batch_size, seed=opt.seed + 1))
    results_dir = Path(opt.results_dir) / name
    results_dir.mkdir(parents=True, exist_ok=True)

    from de_i2i_gan_tpu.metrics.evaluator import defectgan_generator_fn
    generate = defectgan_generator_fn(steps, cfg, state)

    if opt.metrics:
        from de_i2i_gan_tpu.metrics.evaluator import Evaluator
        ev = Evaluator(dims=opt.dims)
        out = ev.evaluate_generator(
            generate, bg_loader, df_loader, num_imgs=opt.num_imgs,
            npz_path=Path(opt.npz_path) if opt.npz_path else None,
            metrics=tuple(opt.metrics),
            num_lpips_images=opt.num_lpips_images)
        print({k: round(v, 4) for k, v in out.items()})
        if opt.metrics_out:
            import json
            Path(opt.metrics_out).parent.mkdir(parents=True, exist_ok=True)
            Path(opt.metrics_out).write_text(json.dumps(out))

    if opt.save_img_grid or opt.save_img:
        labels = jnp.eye(cfg.label_nc)[1:]
        bg_imgs, _, _ = next(iter(bg_loader))
        bg_imgs = jnp.asarray(bg_imgs[:opt.num_display_images])
        feat = None
        if cfg.style_norm_block_type == "sean":
            n = bg_imgs.shape[0] * labels.shape[0]
            feat = jnp.zeros((n, cfg.num_embeds, cfg.embed_nc))
        rep = jnp.repeat(bg_imgs, labels.shape[0], axis=0)
        rep_l = jnp.tile(labels, (bg_imgs.shape[0], 1))
        out, prob = steps.jit_generate(state, rep, rep_l, feat)
        out = np.asarray(out).reshape(bg_imgs.shape[0], labels.shape[0],
                                      *out.shape[1:])
        prob = np.asarray(prob).reshape(bg_imgs.shape[0], labels.shape[0],
                                        *prob.shape[1:])
        for i in range(out.shape[0]):
            panels = [np.asarray(bg_imgs[i])]
            for j in range(out.shape[1]):
                panels.append(out[i, j])
                if opt.save_img_grid:
                    panels.append(heatmap(prob[i, j, :, :, 0]))
            _save_image(np.concatenate(panels, axis=1),
                        results_dir / f"grid_{i}.png")
        print(f"wrote {out.shape[0]} grids to {results_dir}")

    if opt.cal_clf:
        from de_i2i_gan_tpu.losses.common import cal_loss
        correct = total = 0
        d_apply = jax.jit(lambda v, x: steps.D.apply(v, x, train=False))
        for imgs, labels, _ in df_loader:
            _, cls = d_apply({"params": state.D.params, **state.D.state},
                             jnp.asarray(imgs))
            if clf_loss_type == "bce":
                pred = np.asarray(cls) > 0
                correct += (pred == (np.asarray(labels) > 0.5)).all(1).sum()
            else:
                correct += (np.asarray(cls).argmax(1) ==
                            np.asarray(labels).argmax(1)).sum()
            total += imgs.shape[0]
        print(f"classifier accuracy: {correct / max(total, 1):.4f}")

    if opt.cal_mfid:
        # per-class FID averaged over defect classes (mFID,
        # defectgan_metrics.py:104-123). --npy_path points at either the
        # reference's pickled dict {label_tuple: stats/activations} or a
        # directory of stats_<key>.npy activation dumps (--save_stats).
        from de_i2i_gan_tpu.metrics.evaluator import Evaluator
        from de_i2i_gan_tpu.metrics.fid import (ActivationStats,
                                                mfid_from_class_stats)
        assert opt.npy_path, "--cal_mfid requires --npy_path"

        def _to_stats(v):
            v = np.asarray(v, np.float32)
            if v.ndim == 2 and v.shape[0] > 1:  # raw activations
                st = ActivationStats(v.shape[1])
                st.update(v)
                return st.finalize()
            return tuple(v)  # already (mu, sigma)

        p = Path(opt.npy_path)
        real_stats = {}
        if p.is_dir():
            for f in sorted(p.glob("stats_*.npy")):
                real_stats[f.stem[len("stats_"):]] = _to_stats(np.load(f))
        else:
            for k, v in np.load(p, allow_pickle=True).item().items():
                key = "-".join(str(i) for i, x in enumerate(k) if x == 1) \
                    if isinstance(k, tuple) else str(k)
                real_stats[key] = _to_stats(v)

        ev = Evaluator(dims=opt.dims)
        fake_acts = {}
        bg_it = iter(bg_loader)
        for class_idx in range(1, cfg.label_nc):
            key = str(class_idx)
            if key not in real_stats:
                continue
            acts, seen = [], 0
            while seen < opt.num_imgs:
                bg_imgs, _, _ = next(bg_it)
                lbl = jnp.zeros((bg_imgs.shape[0], cfg.label_nc)
                                ).at[:, class_idx].set(1.0)
                fake = generate(jnp.asarray(bg_imgs), lbl)
                acts.append(np.asarray(ev._features(fake), np.float32))
                seen += fake.shape[0]
            fake_acts[key] = np.concatenate(acts)
        res = mfid_from_class_stats(real_stats, fake_acts)
        per_class = {k: round(v, 4) for k, v in res.items() if k != "mean"}
        print(f"FID for each class: {per_class}")
        print(f"mFID: {res.get('mean', float('nan')):.4f}")
        if opt.metrics_out:
            import json
            Path(opt.metrics_out).parent.mkdir(parents=True, exist_ok=True)
            Path(opt.metrics_out).write_text(json.dumps(
                {"mfid": res.get("mean"), **per_class}))

    if opt.save_diverse_images:
        # Multiple_<combo>/Single_<class> grids over one background batch
        # (test_defectgan.py:269-297): every multi-label combo seen in the
        # defect set, plus each single defect class.
        out_dir = results_dir / "images"
        out_dir.mkdir(parents=True, exist_ok=True)
        bg_imgs, _, _ = next(iter(bg_loader))
        bg_imgs = jnp.asarray(bg_imgs[:opt.num_display_images])

        def grid_for(label_row, path):
            lbl = jnp.tile(jnp.asarray(label_row, jnp.float32)[None],
                           (bg_imgs.shape[0], 1))
            out = np.asarray(generate(bg_imgs, lbl))
            _save_image(np.concatenate(list(out), axis=1), path)

        _, df_labels, _ = next(iter(df_loader))
        df_labels = np.asarray(df_labels)
        multi = np.unique(df_labels[df_labels.sum(axis=1) > 1], axis=0)
        for row in multi:
            grid_for(row, out_dir /
                     f"Multiple_{tuple(int(v) for v in row)}.png")
        for class_idx in range(1, cfg.label_nc):
            row = np.zeros(cfg.label_nc, np.float32)
            row[class_idx] = 1.0
            grid_for(row, out_dir / f"Single_{class_idx}.png")
        print(f"wrote {len(multi)} multi-label + {cfg.label_nc - 1} "
              f"single-label grids to {out_dir}")

    if opt.vis_style_embeds:
        # Per-layer style-MLP activation capture (test_defectgan.py:69-79):
        #   hidden -> mlp_shared / mlp_latent (post-ReLU, the Sequential
        #             output the reference hooks), mean -> mlp_beta,
        #   std -> mlp_gamma. 3D outputs are averaged over the embed axis
        #   (test_defectgan.py:49-51).
        from de_i2i_gan_tpu.utils.visualize import visualize_embeddings
        from flax.traverse_util import flatten_dict
        etype = opt.vis_style_embeds
        names = {"hidden": ("mlp_shared", "mlp_latent"),
                 "mean": ("mlp_beta",), "std": ("mlp_gamma",)}
        assert etype in names, f"--vis_style_embeds must be one of {list(names)}"
        wanted = names[etype]

        bank = None
        if cfg.style_norm_block_type == "sean" and opt.embed_path:
            from de_i2i_gan_tpu.data.embeddings import EmbeddingBank
            p = str(opt.embed_path)
            bank = (EmbeddingBank.load(opt.embed_path) if p.endswith(".npz")
                    else EmbeddingBank.from_torch_file(opt.embed_path,
                                                       cfg.label_nc))

        variables = {"params": state.G.params, **state.G.state}

        def capture(imgs, labels, feat, rng):
            kn, kl = jax.random.split(rng)
            _, mods = steps.G.apply(
                variables, imgs, labels, feat, train=False,
                rngs={"noise": kn, "latent": kl},
                capture_intermediates=lambda mdl, _m: mdl.name in wanted,
                mutable=["intermediates"])
            out = {}
            for path, vals in flatten_dict(mods["intermediates"]).items():
                v = vals[0]
                if v.ndim == 3:  # (N, num_embeds, C) -> per-sample mean
                    v = v.mean(axis=1)
                elif v.ndim == 4:  # SPADE conv maps (N, H, W, C) -> spatial
                    v = v.mean(axis=(1, 2))  # mean, one vector per sample
                if etype == "hidden":  # reference hooks the post-ReLU output
                    v = jax.nn.relu(v)
                out[".".join(p for p in path if p != "__call__")] = v
            return out

        capture = jax.jit(capture)
        layer_embeds: dict = {}
        rng = jax.random.PRNGKey(opt.seed)
        for imgs, labels, _ in df_loader:
            imgs, labels = jnp.asarray(imgs), jnp.asarray(labels)
            feat = None
            if cfg.style_norm_block_type == "sean":
                rng, k = jax.random.split(rng)
                feat = (bank.sample(labels, cfg.num_embeds, k) if bank else
                        jnp.zeros((imgs.shape[0], cfg.num_embeds,
                                   cfg.embed_nc)))
            rng, k = jax.random.split(rng)
            acts = capture(imgs, labels, feat, k)
            lbl = np.asarray(labels)
            for lname, v in acts.items():
                d = layer_embeds.setdefault(lname, {})
                for e, l in zip(np.asarray(v), lbl):
                    d.setdefault(tuple(int(x) for x in l), []).append(e)
        for lname, embeds in layer_embeds.items():
            out = results_dir / "pca" / f"{lname}.png"
            visualize_embeddings(embeds, out, reduction="pca")
        print(f"wrote {len(layer_embeds)} style-embed PCA scatters "
              f"({etype}) to {results_dir / 'pca'}")

    if opt.save_stats:
        from de_i2i_gan_tpu.metrics.evaluator import Evaluator
        ev = Evaluator(dims=opt.dims)
        acts: dict = {}
        for imgs, labels, _ in df_loader:
            feats = np.asarray(ev._features(jnp.asarray(imgs)))
            for f, l in zip(feats, np.asarray(labels)):
                key = "-".join(str(i) for i, v in enumerate(l) if v == 1)
                acts.setdefault(key, []).append(f)
        for key, feats in acts.items():
            np.save(results_dir / f"stats_{key}.npy", np.stack(feats))
        print(f"wrote per-class stats for {len(acts)} classes")


if __name__ == "__main__":
    main(sys.argv[1:])
