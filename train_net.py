"""Training entry point (mirrors reference train_net.py CLI)."""


def main():
    # multi-host process group first, before any device query
    # (ref: train_net.py:93-98 NCCL env:// init)
    from neuralbody_tpu.parallel.bootstrap import maybe_initialize_distributed
    maybe_initialize_distributed()

    from neuralbody_tpu.config import make_cfg_from_args
    cfg, args = make_cfg_from_args()
    if args.test:
        cfg.train.epoch = 0

    import jax
    if cfg.fix_random:
        # cfg.seed governs all RNG domains (ref: train_net.py:12-15 seeds
        # torch only); the loader's per-batch reseeding and the trainer's
        # key chains fold in the same seed (datasets/loader.py:_batch_seed,
        # train/trainer.py)
        import numpy as np
        np.random.seed(cfg.seed)

    from neuralbody_tpu.train.trainer import Trainer
    trainer = Trainer(cfg)
    trainer.fit()
    if not cfg.skip_eval:
        trainer.validate()


if __name__ == "__main__":
    main()
