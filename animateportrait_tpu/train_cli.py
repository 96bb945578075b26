"""Training CLI with the reference's train.py flag surface.

    python -m animateportrait_tpu.train_cli --dataroot <root> \
        --name training/drawing1 --model geomgm_ifw_fore \
        --netG resnet_9blocks_rcatland32_full_ifw --netg_resb_div 3 \
        --netg_resb_disp 3 --output_nc 1 --lr 0.00005 --lambda_geom 50 ...

Equivalent of `Module2/train.py:7-65`: dataset + model + epoch loop with
loss printing, periodic checkpointing (Orbax), and linear lr decay — but
the whole step is one jitted SPMD computation data-parallel over all
devices, and frozen perception nets come from converted checkpoints in
`--frozen_dir` (random init with a warning when absent).
"""
from __future__ import annotations

import os
import sys

import numpy as np

# Persistent XLA compile cache: repeated CLI runs skip the (substantial)
# jit compiles of the audio/landmark/render programs. User-overridable.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/animateportrait_jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main(argv=None):
    from animateportrait_tpu.utils.options import (
        archive_options, build_train_argparser, to_configs)

    parser = build_train_argparser()
    parser.add_argument("--frozen_dir", default="checkpoints",
                        help="dir with converted frozen-net checkpoints")
    parser.add_argument("--max_steps", type=int, default=0,
                        help="stop after N steps (0 = run all epochs)")
    # multi-host SPMD: one process per host, the SAME single-program
    # train step over the global device mesh (ICI within host/slice, DCN
    # across); each process loads its own shard of every batch. On TPU
    # pods the coordinator/process args auto-detect from the TPU env.
    parser.add_argument("--multihost", type=int, default=0)
    parser.add_argument("--coordinator_address", default=None)
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    args = parser.parse_args(argv)
    cfg, data_cfg = to_configs(args)

    import jax

    # AP_PLATFORM=cpu forces the backend (tests / multihost-on-CPU): the
    # JAX_PLATFORMS env var is ineffective when a site hook (e.g. the
    # axon register) has already pinned jax_platforms via config update
    # in every interpreter — only another config update overrides it
    if os.environ.get("AP_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["AP_PLATFORM"])
    if args.multihost:
        jax.distributed.initialize(
            coordinator_address=args.coordinator_address,
            num_processes=args.num_processes,
            process_id=args.process_id)
    proc0 = jax.process_index() == 0
    if proc0:
        print(archive_options(args))

    import time as _time
    _t0 = _time.time()

    def _stage(name):
        if os.environ.get("AP_MH_DEBUG"):
            print(f"[stage +{_time.time() - _t0:7.1f}s] {name}",
                  file=sys.stderr, flush=True)

    from animateportrait_tpu.utils.observe import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from animateportrait_tpu.data.umlvd_ifw import UMLVDIFWDataset
    from animateportrait_tpu.io.checkpoint import CheckpointManager
    from animateportrait_tpu.train import module2 as m2
    from animateportrait_tpu.utils.observe import LossLogger, StepTimer

    _stage("dataset")
    ds = UMLVDIFWDataset(data_cfg)
    if len(ds.A_paths) == 0:
        raise SystemExit(f"no photos under {data_cfg.root}/Photo")

    n_proc = jax.process_count()
    n_dev = args.data_parallel or len(jax.devices())
    if n_proc > 1:
        n_dev = len(jax.devices())  # multihost: always the global mesh
    devices = jax.devices()[:n_dev]
    mesh = Mesh(np.array(devices), ("data",))
    batch_sharding = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    # round the global batch up to the device count: every device gets
    # equal shards (uneven GSPMD shards break the multihost
    # make_array_from_process_local_data assembly), and devices are
    # distributed evenly over processes so per-process counts follow
    per_step = -(-max(args.batch_size, n_dev) // n_dev) * n_dev
    local_per_step = per_step // n_proc

    rng = jax.random.key(0)
    example = m2.make_example_batch(cfg, batch_size=per_step)
    _stage("init_state")
    state = m2.init_state(cfg, rng, example)
    if args.verbose and proc0:
        # base_options --verbose: per-network parameter counts (the
        # reference prints each net's architecture + total params)
        def _count(tree):
            return sum(int(np.prod(x.shape))
                       for x in jax.tree_util.tree_leaves(tree))
        print(f"[verbose] G params: {_count(state.g_params) / 1e6:.3f} M")
        for dname, dp in sorted(state.d_params.items()):
            print(f"[verbose] D[{dname}] params: {_count(dp) / 1e6:.3f} M")

    def load_frozen():
        fd = args.frozen_dir
        from animateportrait_tpu.io.torch_convert import (
            load_torch_statedict)
        from animateportrait_tpu.models.flowunet import load_flowunet_params
        from animateportrait_tpu.models.modnet import load_modnet_params
        from animateportrait_tpu.models.perception import (
            load_mobilefacenet_params, load_sphere20a_params)

        def opt(path, loader, fallback_key):
            # native flax checkpoint (a net trained/frozen by THIS
            # framework, e.g. tools/train_standin_frozen.py) wins over
            # a converted torch one of the same role
            native = os.path.join(fd, f"{fallback_key}.flax.npz")
            if os.path.exists(native):
                from animateportrait_tpu.io.checkpoint import load_flax_npz
                print(f"[train] frozen {fallback_key}: native {native}")
                return load_flax_npz(native)
            if os.path.exists(path):
                return loader(load_torch_statedict(path))
            print(f"[train] WARNING: missing frozen ckpt {path}; "
                  "random init", file=sys.stderr)
            return None

        frozen = m2.init_frozen_random(rng, cfg.crop_size,
                                       cfg.face_recog_model)
        # the native name for the 'sphere' SLOT depends on which face
        # net fills it: a sphere.flax.npz stand-in (Sphere20a) must not
        # shadow a --face_recog_model senet selection — the param trees
        # are incompatible and the step would crash (or silently swap
        # the loss net)
        if cfg.use_senet:
            # --face_recog_model with 'senet' in the path selects the
            # 224x224 SENet50 FaceLoss (networks.py:2862-2876); the
            # senet50_ft weights ship as a numpy pickle, not a state dict
            from animateportrait_tpu.models.perception import (
                load_senet50_params)
            face_path = cfg.face_recog_model if os.path.isabs(
                cfg.face_recog_model) else os.path.join(
                    fd, os.path.basename(cfg.face_recog_model))
            face_entry = (face_path, load_senet50_params)
        else:
            face_entry = (os.path.join(fd, "sphere20a_20171020.pth"),
                          load_sphere20a_params)
        repl_map = {
            "modnet": (os.path.join(
                fd, "modnet_photographic_portrait_matting.ckpt"),
                load_modnet_params),
            "mobilefacenet": (os.path.join(
                fd, "mobilefacenet_model_best.pth.tar"),
                lambda sd: load_mobilefacenet_params(
                    sd.get("state_dict", sd))),
            "sphere": face_entry,
            "flowunet": (os.path.join(
                fd, "FlowReg_id_flow_faces", "best_net_netF.pth"),
                load_flowunet_params),
        }
        updates = {}
        for name, (path, loader) in repl_map.items():
            native_key = ("senet" if name == "sphere" and cfg.use_senet
                          else name)
            v = opt(path, loader, native_key)
            if v is not None:
                updates[name] = v
        return frozen.replace(**updates) if updates else frozen

    _stage("load_frozen")
    frozen = load_frozen()
    # donate the train state so XLA reuses its buffers in place — the
    # state is hundreds of arrays and re-allocating it every step costs
    # real time (and doubles peak memory) on TPU
    raw_step = m2.build_train_step(cfg)
    step_fn = jax.jit(raw_step, donate_argnums=(0,))
    # visual dumps fetch the (host-sharded) batch; skip under multihost
    vis_fn = (jax.jit(raw_step.visuals_fn)
              if args.display_freq and n_proc == 1 else None)
    if args.display_freq and n_proc > 1 and proc0:
        print("[train] --display_freq disabled under --multihost "
              "(batch shards are not host-addressable)", file=sys.stderr)

    # Replicate host values onto the mesh. Multihost must NOT use
    # device_put: putting an uncommitted value to a sharding that spans
    # other processes triggers jax's assert_equal value check — one
    # cross-process allgather (with its own Gloo/NCCL context and a 30s
    # init deadline) PER LEAF, which both crawls and deadlocks if any
    # process is >30s behind (e.g. a compile-cache miss).
    # make_array_from_process_local_data assembles the same global
    # array from the (identical, seed-derived) local copy, collective-free.
    def _replicate(x):
        if n_proc > 1:
            return jax.make_array_from_process_local_data(
                repl, np.asarray(x))
        return jax.device_put(x, repl)

    def _step_key(i):
        # a host-built key is uncommitted → same assert_equal hazard as
        # above when jit places it on the multihost mesh; pre-assemble
        # its raw data as a replicated global array instead
        k = jax.random.key(i)
        if n_proc == 1:
            return k
        return jax.random.wrap_key_data(
            _replicate(jax.random.key_data(k)))

    _stage("replicate")
    state = jax.tree_util.tree_map(_replicate, state)
    frozen = jax.tree_util.tree_map(_replicate, frozen)

    def _mh_barrier(name, timeout_ms=1_800_000):
        # The coordination-service barrier with a GENEROUS timeout. The
        # cross-process sync points jax/orbax insert themselves (Gloo
        # context init, orbax sync_global_processes) allow only ~30 s,
        # but per-process compile skew here is minutes: single-device
        # init programs bake local device ids into the executable, so
        # process 0 can hit the persistent compile cache while process 1
        # recompiles from scratch (measured 43 s vs 161 s). Re-align at
        # explicit points so no library barrier ever sees that skew.
        if n_proc > 1:
            try:
                from jax._src import distributed
                distributed.global_state.client.wait_at_barrier(
                    name, timeout_in_ms=timeout_ms)
            except Exception as e:  # keep training usable if API moves
                print(f"[train] barrier {name} unavailable: {e}",
                      file=sys.stderr)

    _mh_barrier("ap:post_init")
    if n_proc > 1:
        # establish the mesh's Gloo/collective cliques while processes
        # are aligned (context init has a hard 30 s deadline); later
        # collectives (orbax's barrier allgather, the train step) reuse
        # or re-init them without racing a compile
        warm = jax.jit(lambda x: jnp.sum(x),
                       in_shardings=batch_sharding, out_shardings=repl)
        local = np.ones((n_dev // n_proc,), np.float32)
        g = jax.make_array_from_process_local_data(batch_sharding, local)
        jax.block_until_ready(warm(g))

    _stage("ckpt_mgr")
    logger = LossLogger(args.checkpoints_dir, args.name)
    ckpt = CheckpointManager(
        os.path.join(args.checkpoints_dir, args.name, "orbax"),
        save_interval_steps=args.save_epoch_freq * cfg.steps_per_epoch)
    if args.continue_train and ckpt.latest_step() is not None:
        # --load_iter resumes from that exact saved step; default latest
        state = ckpt.restore(args.load_iter or None, state)
        if proc0:
            print(f"[train] resumed from step {int(state.step)}")
        if args.epoch_count > 1 and proc0:
            print("[train] --epoch_count ignored with --continue_train "
                  "(the restored step already encodes the epoch)",
                  file=sys.stderr)
    elif args.epoch_count > 1:
        # reference train.py:19 starts the epoch loop at epoch_count and
        # its linear-lr lambda adds epoch_count to the scheduler epoch
        # (networks.py:57); here epochs derive from state.step, so the
        # same shift is an initial step offset
        state = state.replace(step=state.step + jnp.asarray(
            (args.epoch_count - 1) * cfg.steps_per_epoch,
            dtype=state.step.dtype))

    # distinct sampling stream per process (each loads its own batch
    # shard); the jitted step itself stays identical across processes
    np_rng = np.random.default_rng(jax.process_index())
    total_epochs = cfg.niter + cfg.niter_decay
    step = int(state.step)
    timer = StepTimer()

    # Background prefetcher (the torch num_threads DataLoader equivalent,
    # Module2/data/__init__.py:75-79): one producer thread assembles the
    # next batches — image decode on the native thread pool — and
    # device_puts them while the previous step computes.
    import queue
    import threading

    prefetch_q: "queue.Queue" = queue.Queue(maxsize=2)
    stop_evt = threading.Event()
    producer_exc: list[BaseException] = []

    def _put(v):
        if n_proc > 1:
            # this process contributes its local shard of the global
            # batch; jax assembles the sharded global array
            return jax.make_array_from_process_local_data(
                batch_sharding, np.asarray(v))
        return jax.device_put(jnp.asarray(v), batch_sharding)

    def _producer():
        try:
            while not stop_evt.is_set():
                idx = np_rng.integers(0, len(ds), size=local_per_step)
                b = ds.batch(list(idx), np_rng,
                             num_threads=args.num_threads)
                b = {k: _put(v) for k, v in b.items()}
                while not stop_evt.is_set():
                    try:
                        prefetch_q.put(b, timeout=1.0)
                        break
                    except queue.Full:
                        pass
        except BaseException as e:  # surface data errors in the main loop
            producer_exc.append(e)

    producer = threading.Thread(target=_producer, daemon=True)
    _stage("producer")
    producer.start()

    def next_batch():
        while True:
            try:
                return prefetch_q.get(timeout=5.0)
            except queue.Empty:
                if producer_exc:
                    raise RuntimeError(
                        "data loader thread failed") from producer_exc[0]
                if not producer.is_alive():
                    raise RuntimeError("data loader thread exited")

    _mh_barrier("ap:pre_train")
    for epoch in range(step // cfg.steps_per_epoch + 1, total_epochs + 1):
        for _ in range(cfg.steps_per_epoch):
            batch = next_batch()
            timer.data_done()
            _stage(f"step {step}")
            state, metrics = step_fn(state, batch, frozen,
                                     _step_key(step))
            step += 1
            if step % args.print_freq == 0:
                jax.block_until_ready(metrics)
                t_comp, t_data = timer.step_done()
                if proc0:
                    logger.log(epoch, step, metrics, t_comp, t_data)
            else:
                timer.step_done()
            if vis_fn is not None and step % args.display_freq == 0:
                from animateportrait_tpu.utils.observe import (
                    draw_lm_overlay)

                vis, aux = jax.device_get(vis_fn(state, batch, frozen))
                vis["fake_B_lm_68_vis"] = draw_lm_overlay(
                    vis["fake_B"], aux["fb_lm"], aux["winB"])
                vis["fake_B_lm_68_vist"] = draw_lm_overlay(
                    vis["fake_B"], aux["tb_lm"], aux["winB"])
                vis["fake_B2_lm_68_vis"] = draw_lm_overlay(
                    vis["fake_B2"], aux["fb2_lm"], aux["winB2"])
                vis["fake_B2_lm_68_vist"] = draw_lm_overlay(
                    vis["fake_B2"], aux["tb2_lm"], aux["winB2"])
                logger.save_visuals(
                    vis, epoch, iters=step,
                    update_html=(not args.no_html
                                 and step % max(1, args.update_html_freq)
                                 == 0))
            # checkpoint saves run on EVERY process: orbax coordinates
            # internally (barriers + primary-host writes); a proc0-only
            # call would deadlock its cross-process sync
            if args.save_latest_freq and step % args.save_latest_freq == 0:
                # reference saves latest_net_* every save_latest_freq
                # (train.py:48-55) — a single rolling slot, NOT an epoch
                # snapshot (routing it into the epoch namespace would
                # evict epoch checkpoints via max_to_keep); with
                # --save_by_iter every such save is also kept under
                # iters/ unpruned
                ckpt.save(step, jax.device_get(state), latest=True,
                          keep=args.save_by_iter)
            if args.max_steps and step >= args.max_steps:
                stop_evt.set()
                # force: off-cadence unforced saves are silently skipped
                # by orbax, losing the final state
                ckpt.save(step, jax.device_get(state), force=True)
                if proc0:
                    print(f"[train] stopped at "
                          f"max_steps={args.max_steps}")
                return
        ckpt.save(step, jax.device_get(state))
        if proc0:
            print(f"[train] epoch {epoch} done (step {step})")
    stop_evt.set()


if __name__ == "__main__":
    main()
