"""ViT classifier evaluation + per-label CLS-embedding dump (reference:
defectGAN/test_vit.py).

Modes (composable, like the reference):
  --calc_classifier_acc    exact-match accuracy + loss of the linear head
                           (test_vit.py:24-37)
  --visualize_tsne         t-SNE scatter of per-label CLS embeddings
                           (test_vit.py:104-109)
  --save_embeddings        per-label embedding bank -> .npz, the --embed_path
                           artifact SEAN consumes (test_vit.py:53-66)

The reference deliberately evaluates under the *augmented* transform
(flips + color jitter, test_vit.py:86-94) so the embedding bank covers
appearance variation; we keep that behavior.
"""
from __future__ import annotations

import sys
from pathlib import Path

import numpy as np


def main(argv=None):
    import jax
    import jax.numpy as jnp
    from de_i2i_gan_tpu.config.options import Options, to_train_config
    from de_i2i_gan_tpu.data.datasets import find_dataset_using_name
    from de_i2i_gan_tpu.data.pipeline import DataLoader
    from de_i2i_gan_tpu.data.transforms import TrainTransform
    from de_i2i_gan_tpu.train.checkpoint import load_checkpoint
    from de_i2i_gan_tpu.train.vit_steps import ViTSteps, dump_embeddings

    opt = Options("vit_test").parse(argv)
    opt.label_nc = getattr(opt, "label_nc", 6)

    cls = find_dataset_using_name(opt.dataset_name)
    if opt.dataset_name == "synthetic":
        dataset = cls(image_size=opt.image_size, label_nc=opt.label_nc,
                      length=64, data_type=opt.data_type, seed=opt.seed)
    else:
        dataset = cls(opt.data_dir, opt.dataset_name, opt.phase,
                      opt.data_type,
                      transform=TrainTransform(opt.image_size), seed=opt.seed)
    clf_loss_type = cls.clf_loss_type
    print(f"{len(dataset)} images in {opt.phase} {opt.data_type} set")

    tcfg = to_train_config(opt, clf_loss_type)
    loader = DataLoader(dataset, opt.batch_size, seed=opt.seed)
    steps = ViTSteps(opt.label_nc, tcfg, opt.model_size,
                     iters_per_epoch=len(loader), num_epochs=1,
                     image_size=opt.image_size)
    state = steps.init_state(jax.random.PRNGKey(opt.seed))
    name = opt.load_model_name or opt.name
    state = load_checkpoint(opt.ckpt_dir, name, opt.which_epoch, state,
                            strict=False)

    results_dir = Path(opt.results_dir) / name
    results_dir.mkdir(parents=True, exist_ok=True)
    stem = f"{opt.which_epoch}_{opt.phase}_{opt.data_type}"

    if opt.calc_classifier_acc:
        from de_i2i_gan_tpu.losses.common import cal_loss
        logits_fn = jax.jit(lambda p, e: steps.head.apply({"params": p}, e))
        correct, total, losses = 0, 0, []
        for imgs, labels, _ in loader:
            embeds = steps.jit_embed(jnp.asarray(imgs))
            logits = logits_fn(state.params, embeds)
            losses.append(float(cal_loss(logits, jnp.asarray(labels),
                                         clf_loss_type)))
            logits, labels = np.asarray(logits), np.asarray(labels)
            if clf_loss_type == "bce":
                # sigmoid(x) >= 0.5  <=>  x >= 0; exact multilabel match
                # (test_vit.py:31-33)
                correct += ((logits >= 0) == (labels > 0.5)).all(1).sum()
            else:
                correct += (logits.argmax(1) == labels.argmax(1)).sum()
            total += imgs.shape[0]
        acc = correct / max(total, 1)
        print(f"Acc: {acc:.3f} ({correct}/{total}), "
              f"Loss: {np.mean(losses):.3f}")

    if opt.visualize_tsne or opt.save_embeddings:
        bank_dict: dict = {}
        for epoch in range(max(opt.num_embeddings_epochs, 1)):
            part = dump_embeddings(steps, iter(loader), opt.label_nc)
            for k, v in part.items():
                bank_dict.setdefault(k, []).extend(v)
        n = sum(len(v) for v in bank_dict.values())
        print(f"collected {n} embeddings over {len(bank_dict)} label combos")

        if opt.visualize_tsne:
            from de_i2i_gan_tpu.utils.visualize import visualize_embeddings
            out = results_dir / f"{stem}_tsne_test.png"
            visualize_embeddings(bank_dict, out, reduction="tsne")
            print(f"t-SNE scatter -> {out}")

        if opt.save_embeddings:
            from de_i2i_gan_tpu.data.embeddings import EmbeddingBank
            bank = EmbeddingBank.from_dict(bank_dict, opt.label_nc)
            out = results_dir / f"{stem}_embeddings.npz"
            bank.save(out)
            print(f"Embeddings saved to {out}")


if __name__ == "__main__":
    main(sys.argv[1:])
