"""Training entry point (mirrors reference train_net.py CLI)."""


def main():
    from neuralbody_tpu.config import make_cfg_from_args
    cfg, args = make_cfg_from_args()
    if args.test:
        cfg.train.epoch = 0

    import jax
    if cfg.fix_random:
        import numpy as np
        np.random.seed(0)

    from neuralbody_tpu.train.trainer import Trainer
    trainer = Trainer(cfg)
    trainer.fit()
    if not cfg.skip_eval:
        trainer.validate()


if __name__ == "__main__":
    main()
