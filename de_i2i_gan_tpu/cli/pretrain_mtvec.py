"""MVTec MAE pretraining entry (reference: defectGAN/pretrain_mtvec.py) —
an alias of ``train_mtvec --pretrain`` kept for 1:1 script parity."""
from __future__ import annotations

import sys

from de_i2i_gan_tpu.cli.train_mtvec import main as _main


def main(argv=None):
    return _main(["--pretrain", *(argv or [])])


if __name__ == "__main__":
    main(sys.argv[1:])
