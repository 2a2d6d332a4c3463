"""MVTec training wrappers (reference: defectGAN/train_mtvec.py and
pretrain_mtvec.py are thin re-wirings of the defectgan/MAE trainers onto
MTVecDataset with cce classification).

    python -m de_i2i_gan_tpu.cli.train_mtvec --dataset_data_type pill ...
    python -m de_i2i_gan_tpu.cli.train_mtvec --pretrain --dataset_data_type pill
"""
from __future__ import annotations

import sys


def main(argv=None):
    argv = list(argv or [])
    pretrain = "--pretrain" in argv
    if pretrain:
        argv.remove("--pretrain")
    argv += ["--dataset_name", "mtvec"]
    if pretrain:
        from de_i2i_gan_tpu.cli.train_mae import main as mae_main
        mae_main(argv)
    else:
        from de_i2i_gan_tpu.cli.train_defectgan import main as dg_main
        dg_main(argv)


if __name__ == "__main__":
    main(sys.argv[1:])
