"""ViT classifier training + embedding dump (reference: defectGAN/train_vit.py,
test_vit.py embedding-extraction path).

    python -m de_i2i_gan_tpu.cli.train_vit --name vit --dataset_name synthetic \
        --model_size base --vit_path /path/to/hf_vit   # frozen backbone

    # offline SEAN embedding bank (the --embed_path artifact):
    python -m de_i2i_gan_tpu.cli.train_vit --name vit --dataset_name synthetic \
        --phase test --dump_embeddings out/embeds.npz
"""
from __future__ import annotations

import sys
from pathlib import Path


def main(argv=None):
    import jax
    from de_i2i_gan_tpu.config.options import Options, to_train_config
    from de_i2i_gan_tpu.cli.train_defectgan import build_datasets
    from de_i2i_gan_tpu.data.pipeline import DataLoader
    from de_i2i_gan_tpu.data.transforms import TrainTransform
    from de_i2i_gan_tpu.train.checkpoint import save_checkpoint
    from de_i2i_gan_tpu.train.vit_steps import ViTSteps, dump_embeddings

    parser_kind = "vit_train"
    extra = []
    if argv and "--dump_embeddings" in argv:
        i = argv.index("--dump_embeddings")
        dump_path = Path(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    else:
        dump_path = None

    opt = Options(parser_kind).parse(argv)
    opt.label_nc = getattr(opt, "label_nc", 6)
    datasets, clf_loss_type = build_datasets(
        opt, "train", TrainTransform(opt.image_size, jitter=False))
    dataset = datasets["defects"]
    tcfg = to_train_config(opt, "cce")

    vit_vars = None
    if opt.vit_path:
        from de_i2i_gan_tpu.models.vit import ViTEncoder, load_hf_vit_weights
        import jax.numpy as jnp
        net = ViTEncoder(model_size=opt.model_size)
        vit_vars = net.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 224, 224, 3)))
        vit_vars = load_hf_vit_weights(opt.vit_path, vit_vars,
                                       opt.model_size)

    loader = DataLoader(dataset, opt.batch_size, seed=opt.seed)
    steps = ViTSteps(opt.label_nc, tcfg, opt.model_size,
                     iters_per_epoch=len(loader), num_epochs=opt.num_epochs,
                     vit_variables=vit_vars, image_size=opt.image_size)
    state = steps.init_state(jax.random.PRNGKey(opt.seed))

    if dump_path is not None:
        import numpy as np
        from de_i2i_gan_tpu.data.embeddings import EmbeddingBank
        bank_dict = dump_embeddings(steps, iter(loader), opt.label_nc)
        bank = EmbeddingBank.from_dict(bank_dict, opt.label_nc)
        dump_path.parent.mkdir(parents=True, exist_ok=True)
        bank.save(dump_path)
        print(f"wrote embedding bank ({sum(bank.counts)} embeddings, "
              f"{int((bank.counts > 0).sum())} label combos) to {dump_path}")
        return

    import jax.numpy as jnp
    for epoch in range(1, max(opt.num_epochs, 1) + 1):
        accs = []
        for imgs, labels, _ in loader:
            state, m = steps.jit_train_step(state, jnp.asarray(imgs),
                                            jnp.asarray(labels))
            accs.append(float(m["acc"]))
        print(f"epoch {epoch}: acc {sum(accs) / max(len(accs), 1):.4f}")
        save_checkpoint(opt.ckpt_dir, opt.name, "latest", state,
                        epoch=epoch, iters=epoch * len(loader))
    save_checkpoint(opt.ckpt_dir, opt.name, opt.num_epochs, state)


if __name__ == "__main__":
    main(sys.argv[1:])
