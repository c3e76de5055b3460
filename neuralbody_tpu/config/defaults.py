"""Default configuration tree.

Mirrors the reference's global defaults (ref: lib/config/config.py:9-129) plus
TPU-specific knobs (static shapes, mesh layout, chunk sizes) that have no
reference counterpart.
"""
import numpy as np

from .node import CfgNode


def default_cfg() -> CfgNode:
    cfg = CfgNode()

    cfg.exp_name = "hello"
    cfg.task = "if_nerf"

    # ---- model ----------------------------------------------------------
    cfg.network_module = "latent_xyzc"
    cfg.renderer_module = "if_clight_renderer"
    cfg.trainer_module = "if_nerf_clight"
    cfg.evaluator_module = "if_nerf"
    cfg.visualizer_module = "if_nerf"
    cfg.train_dataset_module = "multi_view"
    cfg.test_dataset_module = "multi_view"

    cfg.nv = 6890            # number of SMPL vertices (ref: config.py:27)
    cfg.code_dim = 16        # per-vertex latent code width (ref: latent_xyzc.py:13)
    cfg.latent_dim = 128     # per-frame appearance code width (ref: latent_xyzc.py:16)

    # rendering options (ref: configs/zju_mocap_exp/latent_xyzc_313.yaml)
    cfg.xyz_res = 10
    cfg.view_res = 4
    cfg.i_embed = 0
    cfg.raw_noise_std = 0.0
    cfg.N_samples = 64
    cfg.N_importance = 128
    cfg.N_rand = 1024
    cfg.perturb = 1
    cfg.white_bkgd = False
    cfg.lindisp = False
    cfg.use_viewdirs = True
    cfg.netdepth = 8
    cfg.netwidth = 256
    cfg.netdepth_fine = 8
    cfg.netwidth_fine = 256

    # ---- data -----------------------------------------------------------
    cfg.human = 313
    cfg.training_view = [0, 6, 12, 18]
    cfg.begin_ith_frame = 0
    cfg.ith_frame = 0
    cfg.num_train_frame = 1
    cfg.num_novel_pose_frame = 1000
    cfg.num_render_frame = -1
    cfg.frame_interval = 1
    cfg.num_render_views = 50
    cfg.smpl = "smpl"
    cfg.vertices = "vertices"
    cfg.params = "params"
    cfg.mask_bkgd = True
    cfg.H = 1024
    cfg.W = 1024
    cfg.ratio = 0.5
    cfg.big_box = False
    cfg.voxel_size = [0.005, 0.005, 0.005]  # dhw
    cfg.ptot_vsize = [0.02, 0.02, 0.02]  # t-pose warped grid voxels
    cfg.warping_dir = "warping"          # prepare_warping.py output dir
    cfg.rot_ratio = 0.0
    cfg.rot_range = float(np.pi / 32)
    cfg.body_sample_ratio = 0.5
    cfg.face_sample_ratio = 0.0
    cfg.add_pointcloud = False

    cfg.train_dataset = CfgNode(
        dict(data_root="", human="", ann_file="", split="train")
    )
    cfg.test_dataset = CfgNode(
        dict(data_root="", human="", ann_file="", split="test")
    )

    # ---- mesh -----------------------------------------------------------
    cfg.mesh_th = 50

    # ---- train ----------------------------------------------------------
    cfg.train = CfgNode()
    cfg.train.batch_size = 1
    cfg.train.epoch = 10000
    # spawn-process loader workers (ref num_workers=16,
    # make_dataset.py:66-67); 0 = in-process prefetch thread. Production
    # training should set this to ~the host core count; tests keep 0 to
    # avoid per-test process spawns.
    cfg.train.num_workers = 0
    cfg.train.shuffle = True
    # "replicated" (default): every host loads the same global batch, rays
    # sharded over all chips. "host": each host loads its own frame shard,
    # global batch = n_devices x batch_size (the reference DDP recipe,
    # ref samplers.py:75-132).
    cfg.train.data_sharding = "replicated"
    cfg.train.optim = "adam"
    cfg.train.lr = 1e-4
    cfg.train.weight_decay = 0.0
    cfg.train.scheduler = CfgNode(
        dict(type="multi_step", milestones=[80, 120, 200, 240], gamma=0.5,
             decay_epochs=1000)
    )
    # multi-scale batch sampler (ref: config.py:70-71, samplers.py:10-47)
    cfg.train.batch_sampler = "default"
    cfg.train.sampler_meta = CfgNode(
        dict(min_hw=[256, 256], max_hw=[480, 640], strategy="range",
             n_buckets=4)
    )
    cfg.ep_iter = -1
    cfg.save_ep = 100
    cfg.save_latest_ep = 5
    cfg.eval_ep = 100
    cfg.grad_clip_value = 40.0   # ref: lib/train/trainers/trainer.py:52
    cfg.resume = True
    cfg.fix_random = False
    # one seed for all three RNG domains: numpy host sampling (when
    # fix_random), the jax param-init key, and the per-epoch/batch seed
    # chains (the reference's fix_random seeds torch only, train_net.py:12-15)
    cfg.seed = 0

    # ---- test -----------------------------------------------------------
    cfg.test = CfgNode()
    cfg.test.batch_size = 1
    cfg.test.epoch = -1
    cfg.test.sampler = "default"
    cfg.test.batch_sampler = "default"
    cfg.test.sampler_meta = CfgNode(
        dict(min_hw=[480, 640], max_hw=[480, 640], strategy="origin",
             n_buckets=1)
    )
    cfg.test.frame_sampler_interval = 30
    cfg.skip_eval = False
    cfg.test_novel_pose = False
    cfg.novel_pose_ni = 100

    # ---- visualization modes (ref: config.py:157-167) -------------------
    cfg.vis_novel_pose = False
    cfg.vis_novel_view = False
    cfg.vis_rotate_smpl = False
    cfg.vis_mesh = False
    # also export the thresholded-occupancy debug mesh next to each .ply
    # (ref: lib/visualizers/if_nerf_mesh.py:13-24 voxel view)
    cfg.vis_voxel_debug = False
    cfg.eval_whole_img = False

    # ---- dirs -----------------------------------------------------------
    cfg.trained_model_dir = "data/trained_model"
    cfg.record_dir = "data/record"
    cfg.result_dir = "data/result"
    cfg.log_interval = 20
    cfg.record_interval = 20

    # ---- TPU-native knobs (no reference counterpart) --------------------
    cfg.tpu = CfgNode()
    # static site-list capacities per encoder level; -1 = derive from data
    cfg.tpu.site_caps = [-1, -1, -1, -1, -1]
    # static dense grid shape (dhw); -1 = max over frames, padded to 32
    cfg.tpu.static_out_sh = [-1, -1, -1]
    cfg.tpu.chunk_rays = 2048        # rays per render chunk (ref 2048 pixels)
    # train steps fused per device dispatch; 8 amortizes the ~22 ms tunnel
    # RTT to <3 ms/step and matches the benchmarked shape (bench.py G=8)
    cfg.tpu.steps_per_dispatch = 8
    cfg.tpu.mesh_pt_chunk = 2048 * 64  # points per mesh-density chunk
    cfg.tpu.compute_dtype = "float32"
    # training interpolation path: "hat" (grouped hat-matmul, fastest on
    # TPU; ops/hat_interp.py) or "site" (index-volume gather path)
    cfg.tpu.interp_mode = "hat"
    cfg.tpu.hat_group_size = 128
    cfg.tpu.hat_tile = [4, 8]
    # ship hat-path z as u16 slab fractions (halves the biggest payload
    # leaf; granularity slab/65535 ~ 0.05 mm — see prepare_hat_batch)
    cfg.tpu.hat_quantize_z = True
    # multiplier on the derived hat static sizes (loader._derive_hat_
    # static probes 8 batches and adds x1.08/x1.15/x1.25). Raise it if a
    # long run overflows the plan caps (ValueError names this knob);
    # every extra % of n_groups costs ~0.3% step time (padding compute).
    cfg.tpu.hat_static_margin = 1.0
    # build the hat plan ON DEVICE from banked geometry: batches carry
    # only rays (~60 KB vs ~0.6 MB; ops/device_plan.py). Bit-parity with
    # the host planner, but measured NET-SLOWER integrated on the
    # tunneled v5e (planning ops cost more than the transfer it saves —
    # CLAUDE.md fresh-path cost model), so off by default; revisit on
    # hosts with real PCIe/DMA where per-batch transfer is cheap.
    cfg.tpu.hat_plan_device = False
    cfg.tpu.data_axis = "data"       # mesh axis name for ray/data parallelism
    cfg.tpu.num_devices = -1         # -1 = all visible devices
    # fused Pallas hat-contraction kernel (ops/pallas_hat.py). Off by
    # default: the kernel alone is ~2x the XLA formulation, but integrated
    # it loses ~1.5 ms/step to layout transposes XLA inserts around the
    # custom calls in the backward (measured; CLAUDE.md "Pallas").
    cfg.tpu.use_pallas = False
    cfg.tpu.cache_frame_geometry = True

    cfg.distributed = False
    cfg.local_rank = 0

    return cfg
