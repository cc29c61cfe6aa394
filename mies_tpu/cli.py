"""CLI: enhance / enhance-volume / evaluate / bench (SURVEY.md section 3).

Usage:
  python -m mies_tpu.cli enhance -c config.yaml input.png [-o out.png] [--report r.png]
  python -m mies_tpu.cli enhance -c config.yaml imgs/*.png -o outdir/   (batch, resumable)
  python -m mies_tpu.cli enhance-volume -c config.yaml vol.npz -o out.npz
  python -m mies_tpu.cli evaluate orig.png enhanced.png -m psnr ssim uqi
  python -m mies_tpu.cli bench -c config.yaml --batch 32 --size 512
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path



def _load_cfg(path: str):
    from mies_tpu.pipeline.config import load_config

    return load_config(path)


def _maybe_mesh(args):
    if getattr(args, "data_parallel", False):
        from mies_tpu.parallel import make_mesh

        return make_mesh()
    return None


def _apply_file_window(cfg, inputs):
    """Rewrite the chain's window_hu stage with the FIRST input's
    modality-recommended WindowCenter/Width (DICOM 0028,1050/1051).
    Returns the new config, or None (error printed) when the request
    can't be honored — never a silent fallback to the config's
    numbers."""
    from mies_tpu.io.dicom import read_dicom_header
    from mies_tpu.pipeline.config import PipelineConfig, StageConfig, validate

    first = inputs[0]
    if first.suffix.lower() not in (".dcm", ".dicom"):
        print("error: --window-from-file needs DICOM input(s)",
              file=sys.stderr)
        return None
    hdr = read_dicom_header(first)
    wc, ww = hdr.get("window_center"), hdr.get("window_width")
    if wc is None or ww is None:
        print(f"error: {first} carries no WindowCenter/WindowWidth "
              "(0028,1050/1051); drop --window-from-file or window "
              "explicitly in the config", file=sys.stderr)
        return None
    stages = []
    hit = False
    for st in cfg.stages:
        if st.op == "window_hu":
            kw = st.kwargs()
            kw.pop("preset", None)
            kw.update(center=float(wc), width=float(ww))
            stages.append(StageConfig.make("window_hu", **kw))
            hit = True
        else:
            stages.append(st)
    if not hit:
        print("error: --window-from-file needs a window_hu stage in "
              "the chain to rewrite", file=sys.stderr)
        return None
    out = PipelineConfig.make(
        stages, name=cfg.name, io=cfg.io_dict(), eval=cfg.eval_dict()
    )
    validate(out)
    return out


def cmd_enhance(args) -> int:
    import time

    from mies_tpu.pipeline import runner

    import os

    cfg = _load_cfg(args.config)
    inputs = [Path(p) for p in args.inputs]
    if getattr(args, "window_from_file", False):
        cfg = _apply_file_window(cfg, inputs)
        if cfg is None:
            return 2
    # batch mode when there are multiple inputs OR the output names a
    # directory — existing, trailing-separator, or suffix-less (a
    # one-file glob with a not-yet-created outdir/ must NOT silently
    # degrade to single-file mode and save an image AS the dir path)
    batch_mode = len(inputs) > 1 or (
        args.output is not None
        and (
            Path(args.output).is_dir()
            or str(args.output).endswith(os.sep)
            or Path(args.output).suffix == ""
        )
    )
    if not batch_mode:
        if args.data_parallel:
            print(
                "error: --data-parallel applies to batch mode only "
                "(single-image runs use one device)",
                file=sys.stderr,
            )
            return 2
        out_path = args.output or inputs[0].with_name(
            inputs[0].stem + ".enhanced" + inputs[0].suffix
        )
        t0 = time.perf_counter()
        out = runner.enhance_image(inputs[0], cfg, out_path)
        wall_ms = (time.perf_counter() - t0) * 1e3
        metrics = None
        if args.report or args.run_report:
            if out.ndim != 2:
                print(
                    "error: --report/--run-report metrics support "
                    "grayscale outputs only (io.channels: per-channel "
                    "produces [C, H, W]); rerun without reports",
                    file=sys.stderr,
                )
                return 2
            import numpy as np

            from mies_tpu.eval.metrics import evaluate
            from mies_tpu.eval.report import reference_u8

            orig = reference_u8(inputs[0], cfg)
            if orig.shape != out.shape:
                print(
                    f"error: --report/--run-report metrics need a "
                    f"shape-preserving chain (input {orig.shape} vs "
                    f"output {out.shape} — resize/crop/rot90 stages "
                    f"change it); rerun without reports",
                    file=sys.stderr,
                )
                return 2
            metrics = evaluate(orig, out, names=("psnr", "ssim"))
        if args.report:
            from mies_tpu.eval.report import save_comparison_report

            save_comparison_report(
                orig, out, args.report, title=cfg.name, metrics=metrics
            )
        if args.run_report:
            from mies_tpu.eval.report import write_run_report

            extra = {"input": str(inputs[0]), "output": str(out_path)}
            if args.stage_costs:
                from mies_tpu.utils.profiling import stage_costs

                extra["stage_costs"] = stage_costs(
                    cfg, shape=out.shape[-2:], batch_size=1
                )
            write_run_report(
                args.run_report, cfg,
                metrics=metrics,
                timings={"wall_ms_including_compile": wall_ms},
                extra=extra,
            )
        print(json.dumps({"output": str(out_path), "shape": list(out.shape)}))
        return 0
    if not args.output:
        print("error: batch mode requires -o OUTPUT_DIR", file=sys.stderr)
        return 2
    if args.report or args.run_report:
        print(
            "error: --report/--run-report are single-image flags; batch "
            "runs record progress in the manifest instead",
            file=sys.stderr,
        )
        return 2
    manifest = runner.enhance_batch(
        inputs, cfg, args.output, batch_size=args.batch,
        resume=not args.no_resume, mesh=_maybe_mesh(args),
    )
    print(
        json.dumps(
            {"done": manifest.done_count, "failed": len(manifest.failures),
             "manifest": str(manifest.path)}
        )
    )
    return 1 if manifest.failures else 0


def cmd_enhance_volume(args) -> int:
    import numpy as np

    from mies_tpu.io.volume import load_volume, save_volume
    from mies_tpu.pipeline import runner

    cfg = _load_cfg(args.config)
    if getattr(args, "window_from_file", False):
        vp = Path(args.input)
        first = (sorted(vp.glob("*.dcm"))[:1] or [vp])[0]             if vp.is_dir() else vp
        cfg = _apply_file_window(cfg, [first])
        if cfg is None:
            return 2
    if getattr(args, "stream", False):
        # disk-to-disk: the volume is never fully resident on the host
        if args.mode == "3d" or args.metrics:
            raise SystemExit(
                "--stream is slice-mode only and incompatible with "
                "--metrics (both need the whole volume in memory)"
            )
        if getattr(args, "isotropic", None) is not None:
            raise SystemExit(
                "--isotropic needs --mode 3d (whole-volume resample); "
                "it cannot run under --stream's slab-at-a-time model"
            )
        meta = runner.enhance_volume_stream(
            args.input, cfg, args.output,
            slab_size=args.slab, var_name=args.var,
            progress=not args.quiet, mesh=_maybe_mesh(args),
        )
        print(json.dumps({
            "input": meta.source, "shape": list(meta.shape),
            "output": args.output, "streamed": True,
        }))
        return 0
    vol, meta = load_volume(args.input, var_name=args.var)
    if getattr(args, "isotropic", None) is not None:
        if args.mode != "3d":
            raise SystemExit("--isotropic needs --mode 3d (it resamples "
                             "the whole [Z, H, W] grid)")
        if args.metrics:
            raise SystemExit("--isotropic changes the grid shape; "
                             "full-reference --metrics need matching "
                             "shapes")
        if meta.spacing is None:
            raise SystemExit(
                "--isotropic needs voxel spacing, which only DICOM "
                "series inputs carry (PixelSpacing + slice positions); "
                "use an explicit resample3d stage for other formats"
            )
        from mies_tpu.pipeline.config import PipelineConfig

        tgt = float(args.isotropic)
        d, h, w = (
            max(1, round(n * s / tgt))
            for n, s in zip(vol.shape, meta.spacing)
        )
        if getattr(args, "data_parallel", False):
            # z-sharded resample3d (parallel/volume_shard.py::
            # resample3d_zband) needs the OUTPUT depth divisible by the
            # device count — never silently change the user's grid
            import jax as _jax

            nd = len(_jax.devices())
            if d % nd:
                lo, hi = (d // nd) * nd, (d // nd + 1) * nd
                raise SystemExit(
                    f"--isotropic {tgt:g} under --data-parallel: target "
                    f"depth {d} is not divisible by the {nd} devices; "
                    f"adjust --isotropic so the depth lands on a multiple "
                    f"of {nd} (nearest: {lo} or {hi} slices), or run "
                    f"without --data-parallel"
                )
        cfg = PipelineConfig.make(
            [("resample3d", {"depth": d, "height": h, "width": w}),
             *cfg.stages],
            name=f"{cfg.name}-iso{tgt:g}mm",
            io=cfg.io_dict(), eval=cfg.eval_dict(),
        )
    if args.mode == "3d":
        import jax.numpy as jnp

        if getattr(args, "data_parallel", False):
            # multi-device volumetric mode: z-shard the WHOLE volume
            # across every device as one SPMD program (3-D stencil slab
            # halos, clahe3d z-bands, psum'd global statistics)
            import jax

            from mies_tpu.parallel import make_mesh, volume_shard_apply

            n = len(jax.devices())
            if vol.shape[0] % n:
                raise SystemExit(
                    f"--data-parallel with --mode 3d z-shards the volume: "
                    f"Z={vol.shape[0]} must divide by the {n} devices"
                )
            fn = volume_shard_apply(cfg, make_mesh(data=1, space=n))
        else:
            from mies_tpu.pipeline.compiler import compile_volume_pipeline

            fn = compile_volume_pipeline(cfg)
        out = np.asarray(fn(jnp.asarray(vol)))
    else:
        out = runner.enhance_volume(
            vol, cfg, slab_size=args.slab, progress=not args.quiet,
            mesh=_maybe_mesh(args),
        )
    save_volume(args.output, out)
    result = {"input": meta.source, "shape": list(out.shape), "output": args.output}
    if args.metrics:
        from mies_tpu.eval.metrics import evaluate_volume
        from mies_tpu.pipeline.compiler import _quantize_u8
        import jax.numpy as jnp

        # compare against the windowed/normalized input on the uint8 scale
        if np.issubdtype(vol.dtype, np.integer) and vol.dtype != np.uint8:
            from mies_tpu.ops.intensity import window_hu

            win = next(
                (st.kwargs() for st in cfg.stages if st.op == "window_hu"), None
            )
            if win is None:
                raise SystemExit(
                    "--metrics on int16 volumes needs a window_hu stage "
                    "to define the reference scale"
                )
            gt = np.asarray(_quantize_u8(window_hu(jnp.asarray(vol), **win)))
        else:
            gt = vol if vol.dtype == np.uint8 else np.asarray(
                _quantize_u8(jnp.asarray(vol))
            )
        m = evaluate_volume(gt, out, names=tuple(args.metrics))
        mpath = str(args.output) + ".metrics.json"
        with open(mpath, "w") as f:
            json.dump(m, f, indent=2)
        result["metrics_mean"] = m["mean"]
        result["metrics_file"] = mpath
    print(json.dumps(result))
    return 0


def cmd_export(args) -> int:
    """AOT-export the compiled chain as a portable .mies artifact."""
    from mies_tpu.pipeline.export import export_pipeline, read_export_header

    cfg = _load_cfg(args.config)
    if args.volume:
        if args.batch is not None:
            raise SystemExit("--batch does not apply to --volume exports "
                             "(whole-volume programs have no batch axis)")
        shape = tuple(args.volume)
        out = export_pipeline(cfg, args.output, shape=shape, volume=True,
                              input_dtype=args.dtype)
    else:
        batch = 32 if args.batch is None else args.batch
        out = export_pipeline(
            cfg, args.output, shape=(args.size, args.size),
            batch_size=None if batch <= 1 else batch,
            input_dtype=args.dtype,
        )
    hdr = read_export_header(out)
    print(json.dumps({
        "artifact": str(out), "bytes": out.stat().st_size,
        "platforms": hdr["platforms"], "input_shape": hdr["input_shape"],
    }))
    return 0


def cmd_doctor(args) -> int:
    """Deployment health report: backend reachability (bounded probe —
    a downed TPU tunnel hangs ~30 min on a naive init), compile cache,
    native parser, virtual-mesh sanity. One JSON object; exit 0 iff a
    usable accelerator OR the CPU fallback path is healthy."""
    import os
    import subprocess
    import sys as _sys

    report: dict = {}
    try:
        import jax

        report["jax"] = jax.__version__
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"fatal": f"jax import failed: {e}"}))
        return 1

    # 1. accelerator probe, bounded, in a SUBPROCESS (init state is
    # process-global; probing in-process would pin this process's
    # backend before the user's real command runs)
    try:
        r = subprocess.run(
            [_sys.executable, "-c",
             "import jax; print(jax.default_backend()); "
             "print(len(jax.devices()))"],
            timeout=args.probe_timeout, capture_output=True, text=True,
            env={k: v for k, v in os.environ.items()
                 if k != "MIES_TPU_BACKEND"},
        )
        if r.returncode == 0:
            try:
                # take the LAST two tokens: plugin banners/runtime
                # messages may precede the probe's own prints
                backend, ndev = r.stdout.split()[-2:]
                report["accelerator"] = {"backend": backend,
                                         "devices": int(ndev)}
            except (ValueError, IndexError):
                report["accelerator"] = {
                    "error": f"unparseable probe output: "
                             f"{r.stdout.strip()[:200]!r}",
                }
        else:
            report["accelerator"] = {
                "error": r.stderr.strip().splitlines()[-1][:200]
                if r.stderr.strip() else f"exit {r.returncode}",
            }
    except subprocess.TimeoutExpired:
        report["accelerator"] = {
            "error": f"backend init exceeded {args.probe_timeout}s — "
                     f"TPU tunnel down? (MIES_TPU_BACKEND=cpu forces "
                     f"the CPU backend)",
        }

    # 2. persistent compile cache (report, never crash: an unwritable
    # cache dir is a FINDING for the health tool, not a traceback)
    try:
        from mies_tpu.utils.profiling import enable_compilation_cache

        cache_dir = enable_compilation_cache()
        n = sum(1 for _ in Path(cache_dir).iterdir())
        report["compile_cache"] = {"dir": str(cache_dir), "entries": n}
    except OSError as e:
        report["compile_cache"] = {"error": str(e)}

    # 3. native host runtime
    from mies_tpu import native

    report["native_dicom"] = {"available": native.available()}

    # 4. sharding sanity on virtual CPU devices (subprocess keeps this
    # process's backend untouched)
    _shard_probe = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "import jax.numpy as jnp; "
        "from mies_tpu.parallel import make_mesh; "
        "from jax.sharding import NamedSharding, PartitionSpec as P; "
        "m = make_mesh(); "
        "x = jax.device_put(jnp.ones((len(jax.devices()), 4)), "
        "NamedSharding(m, P('data'))); "
        "print(float(x.sum()))"
    )
    try:
        r = subprocess.run(
            [_sys.executable, "-c", _shard_probe],
            timeout=180, capture_output=True, text=True,
            env={**os.environ,
                 "XLA_FLAGS": "--xla_force_host_platform_device_count=8"},
        )
        report["sharding"] = (
            {"ok": True, "virtual_devices": 8} if r.returncode == 0
            else {"ok": False,
                  "error": r.stderr.strip().splitlines()[-1][:200]}
        )
    except subprocess.TimeoutExpired:
        report["sharding"] = {"ok": False, "error": "probe timed out"}

    ok = (
        "error" not in report["accelerator"]
        or report["sharding"].get("ok", False)
    )
    report["status"] = "ok" if ok else "degraded"
    print(json.dumps(report, indent=2))
    return 0 if ok else 1


def cmd_warmup(args) -> int:
    """Pre-compile a config's programs into the persistent jit cache.

    First Pallas compiles take 5-20 minutes on remote-compile runtimes;
    a deployment warms the cache once (per config x shape x batch) so
    production jobs start hot. Compiles only — no data is processed.
    """
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mies_tpu.pipeline.compiler import compile_pipeline
    from mies_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    cfg = _load_cfg(args.config)
    h, w = args.size, args.size
    compiled = []
    for b in args.batch:
        t0 = time.perf_counter()
        fn = compile_pipeline(cfg, batched=(b > 1), donate=False)
        shape = (b, h, w) if b > 1 else (h, w)
        dtype = jnp.int16 if args.dtype == "int16" else jnp.float32
        fn.lower(jax.ShapeDtypeStruct(shape, dtype)).compile()
        compiled.append(
            {"batch": b, "shape": [h, w], "dtype": args.dtype,
             "seconds": round(time.perf_counter() - t0, 2)}
        )
    print(json.dumps({"config": cfg.name, "backend": jax.default_backend(),
                      "compiled": compiled}))
    return 0


def cmd_evaluate(args) -> int:
    from mies_tpu.eval.metrics import evaluate
    from mies_tpu.io.image import from_float, load_image

    gt = from_float(load_image(args.original))
    p = from_float(load_image(args.enhanced))
    out = evaluate(gt, p, names=tuple(args.metrics))
    print(json.dumps(out, indent=2))
    return 0


def cmd_serve(args) -> int:
    from mies_tpu.serve import serve

    if args.artifact is None and args.config is None:
        raise SystemExit("serve needs -c CONFIG or --artifact FILE.mies")
    if args.artifact is not None and args.config is not None:
        raise SystemExit(
            "-c and --artifact conflict: the artifact embeds its own "
            "config — pass exactly one"
        )
    if args.artifact is not None and args.warmup:
        raise SystemExit("--warmup is meaningless with --artifact "
                         "(the program is AOT-compiled)")
    warmup = None
    if args.warmup:
        try:
            h, w = (int(x) for x in args.warmup.lower().split("x"))
            warmup = (h, w)
        except ValueError:
            raise SystemExit(
                f"--warmup expects HxW (e.g. 512x512), got {args.warmup!r}"
            )
    if args.max_body_mb <= 0:
        raise SystemExit(f"--max-body-mb must be positive, got "
                         f"{args.max_body_mb}")
    serve(args.config, host=args.host, port=args.port, warmup=warmup,
          artifact=args.artifact,
          max_body_bytes=args.max_body_mb * 2**20)
    return 0


def _ops_listing() -> dict:
    """Op registry -> {op: {param: {default, expects}}} (the `ops`
    command's JSON; tools/gen_ops_doc.py renders it to docs/OPS.md)."""
    import inspect

    from mies_tpu.pipeline.compiler import OP_REGISTRY, STAGE_BUILDERS
    from mies_tpu.pipeline.config import _VALUE_RULES

    out = {}
    for name, fn in sorted(OP_REGISTRY.items()):
        sig = inspect.signature(fn)
        # builders take ONLY config params (no image arg to skip)
        skip = 0 if name in STAGE_BUILDERS else 1
        params = {}
        for p in list(sig.parameters.values())[skip:]:
            info = {}
            if p.default is not inspect.Parameter.empty:
                info["default"] = p.default
            rule = _VALUE_RULES.get(name, {}).get(p.name)
            if rule is not None:
                info["expects"] = rule[1]
            params[p.name] = info
        out[name] = params
    return out


def cmd_ops(args) -> int:
    """Print the op registry as JSON: params, defaults, constraints."""
    print(json.dumps(_ops_listing(), indent=2, default=str))
    return 0


def _default_augment(elastic: float = 0.0):
    """The standard medical-training recipe: full D4 geometry, mild
    intensity jitter on the input, no extra noise (the objective's own
    noise model stays in charge); elastic warp opt-in by amplitude."""
    from mies_tpu.models.augment import AugmentConfig

    return AugmentConfig(hflip=0.5, vflip=0.5, rot90=True,
                         brightness=0.05, contrast=0.1, gamma=0.1,
                         elastic=elastic)


def cmd_train_denoiser(args) -> int:
    from mies_tpu.models.train import train_denoiser

    mesh = None
    if args.data_parallel:
        from mies_tpu.parallel import make_mesh

        mesh = make_mesh()
    depth = args.depth
    if depth is None:
        depth = 2 if args.arch == "unet" else 6
    state, losses, report = train_denoiser(
        steps=args.steps,
        batch=args.batch,
        patch=args.patch,
        features=args.features,
        depth=depth,
        arch=args.arch,
        sigma=args.noise_sigma,
        mesh=mesh,
        checkpoint_dir=args.output,
        data_dir=args.data,
        evaluate=args.eval,
        self_supervised=args.self_supervised,
        augment=(
            _default_augment(args.elastic)
            if (args.augment or args.elastic > 0) else None
        ),
        loss=args.loss,
    )
    print(
        json.dumps(
            {"checkpoint": args.output, "steps": int(state.step),
             "loss_curve": losses, **report}
        )
    )
    return 0


def cmd_bench(args) -> int:
    from mies_tpu.pipeline.runner import time_pipeline

    cfg = _load_cfg(args.config)
    res = time_pipeline(
        cfg,
        shape=(args.size, args.size),
        batch_size=args.batch,
        iters=args.iters,
    )
    res["config"] = cfg.name
    print(json.dumps(res))
    return 0


def main(argv=None) -> int:
    import os

    if os.environ.get("MIES_TPU_BACKEND", "").lower() == "cpu":
        # Escape hatch when the TPU tunnel is down (backend init hangs
        # ~30 min before raising): the axon plugin force-overrides
        # JAX_PLATFORMS, so pin via jax.config — the one knob it honors.
        import jax

        jax.config.update("jax_platforms", "cpu")

    from mies_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()  # Pallas kernels compile slowly; cache them

    ap = argparse.ArgumentParser(prog="mies_tpu", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("enhance", help="enhance image(s) with a config chain")
    p.add_argument("inputs", nargs="+")
    p.add_argument("-c", "--config", required=True)
    p.add_argument("-o", "--output", help="output file (single) or dir (batch)")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard each batch over all devices (batch must "
                        "divide by the device count)")
    p.add_argument("--window-from-file", action="store_true",
                   help="rewrite the chain's window_hu stage with the "
                        "first DICOM input's own WindowCenter/Width "
                        "(0028,1050/1051) — the modality's recommended "
                        "display window")
    p.add_argument("--report", help="write before/after PNG report here")
    p.add_argument(
        "--run-report",
        help="write a structured JSON run report (config hash, timings, metrics)",
    )
    p.add_argument(
        "--stage-costs", action="store_true",
        help="include per-stage XLA flops/bytes in the run report",
    )
    p.set_defaults(fn=cmd_enhance)

    p = sub.add_parser("enhance-volume", help="stream a volume through the chain")
    p.add_argument("input")
    p.add_argument("-c", "--config", required=True)
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--var", help="variable name inside .nc/.npz")
    p.add_argument("--slab", type=int, default=16)
    p.add_argument("--mode", choices=["slices", "3d"], default="slices",
                   help="'3d' runs a volumetric chain (clahe3d etc.) on the whole volume")
    p.add_argument("--window-from-file", action="store_true",
                   help="rewrite the chain's window_hu stage with the "
                        "first DICOM file's WindowCenter/Width")
    p.add_argument("--isotropic", type=float, metavar="MM",
                   help="(--mode 3d) resample to isotropic MM-mm voxels "
                        "before the chain, using the DICOM series' "
                        "PixelSpacing/slice positions")
    p.add_argument("--metrics", nargs="+", default=None,
                   help="also write per-slice quality metrics vs the "
                        "(windowed) input, e.g. --metrics psnr ssim")
    p.add_argument("--stream", action="store_true",
                   help="disk-to-disk slab streaming (O(slab) host memory; "
                        "output .nc/.npy/DICOM dir)")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard over all devices: slice mode shards each "
                        "slab's batch; --mode 3d z-shards the whole "
                        "volume as one SPMD program (Z must divide by "
                        "the device count)")
    p.add_argument("-q", "--quiet", action="store_true")
    p.set_defaults(fn=cmd_enhance_volume)

    p = sub.add_parser("evaluate", help="full-reference quality metrics")
    p.add_argument("original")
    p.add_argument("enhanced")
    p.add_argument(
        "-m", "--metrics", nargs="+",
        default=["psnr", "ssim", "uqi"],
    )
    p.set_defaults(fn=cmd_evaluate)

    p = sub.add_parser("train-denoiser", help="train the learned denoiser")
    p.add_argument("-o", "--output", required=True, help="checkpoint dir")
    p.add_argument("--data", help="directory of real slices "
                   "(png/jpg/tif/npy/dcm) to train on; default: synthetic "
                   "phantoms")
    p.add_argument("--eval", action="store_true",
                   help="report PSNR vs the bilateral baseline on a "
                        "held-out phantom set")
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--patch", type=int, default=64)
    p.add_argument("--arch", choices=("dncnn", "unet"), default="dncnn",
                   help="model family: all-3x3 residual CNN or U-Net "
                        "encoder-decoder (larger receptive field/FLOP)")
    p.add_argument("--features", type=int, default=32)
    p.add_argument("--depth", type=int, default=None,
                   help="dncnn: conv layers (default 6); unet: stride-2 "
                        "levels (default 2)")
    p.add_argument("--noise-sigma", type=float, default=0.08)
    p.add_argument("--self-supervised", action="store_true",
                   help="Noise2Void blind-spot training: no clean "
                        "targets — learns from the (noisy) data alone; "
                        "with --data, the slices' own noise is the noise")
    p.add_argument("--loss", choices=("l2", "l1", "ssim", "mix"),
                   default="l2",
                   help="training objective on the denoised estimate: "
                        "l2 (default), l1 (outlier-robust), ssim "
                        "(structural), mix (0.16 L1 + 0.84 SSIM — the "
                        "Zhao et al. restoration recipe); Noise2Void "
                        "supports l1/l2")
    p.add_argument("--augment", action="store_true",
                   help="device-side stochastic augmentation (flips + "
                        "90-degree rotations on input AND target, "
                        "brightness/contrast/gamma jitter on the input "
                        "only)")
    p.add_argument("--elastic", type=float, default=0.0, metavar="PX",
                   help="add elastic deformation (implies --augment): "
                        "smooth random warp with peak displacement PX "
                        "pixels — the classic biomedical augmentation")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard the batch over all devices")
    p.set_defaults(fn=cmd_train_denoiser)

    p = sub.add_parser(
        "serve",
        help="HTTP inference server: warm-compiled POST /enhance "
             "endpoint (see mies_tpu/serve.py)",
    )
    p.add_argument("-c", "--config")
    p.add_argument("--artifact", help="serve a .mies AOT export instead "
                   "of a config: zero startup compile, one fixed-shape "
                   "program")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--warmup", default=None, metavar="HxW",
                   help="compile this input shape before the socket "
                        "opens, e.g. 512x512")
    p.add_argument("--max-body-mb", type=int, default=256,
                   help="reject POST bodies above this size with a 413 "
                        "before reading them (default 256)")
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("ops", help="list every pipeline op with its "
                                   "params, defaults, and constraints")
    p.set_defaults(fn=cmd_ops)

    p = sub.add_parser(
        "export",
        help="AOT-export the compiled chain (StableHLO via jax.export) "
             "as one portable artifact deployment hosts can call "
             "without the config system or a retrace",
    )
    p.add_argument("-c", "--config", required=True)
    p.add_argument("-o", "--output", required=True, help=".mies artifact path")
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--batch", type=int, default=None,
                   help="leading batch axis (default 32; 1 = the "
                        "single-slice program `serve --artifact` needs)")
    p.add_argument("--dtype", default="float32",
                   choices=("float32", "uint8", "uint16", "int16"),
                   help="traced input spec: uint8 for PNG/X-ray serving, "
                        "int16 for CT window_hu chains (raw ints "
                        "normalize in-program), float32 for "
                        "pre-normalized callers")
    p.add_argument("--volume", type=int, nargs=3, metavar=("Z", "H", "W"),
                   help="export the [Z, H, W] volumetric program instead "
                        "(clahe3d / 3-D morphology / resample3d chains)")
    p.set_defaults(fn=cmd_export)

    p = sub.add_parser(
        "doctor",
        help="deployment health report: accelerator reachability "
             "(bounded probe), compile cache, native parser, sharding "
             "sanity — one JSON object",
    )
    p.add_argument("--probe-timeout", type=int, default=240,
                   help="seconds to wait for backend init before "
                        "declaring the tunnel down")
    p.set_defaults(fn=cmd_doctor)

    p = sub.add_parser(
        "warmup",
        help="pre-compile a config's programs into the persistent jit "
             "cache (cold Pallas compiles take minutes; deployments warm "
             "once, then start hot)",
    )
    p.add_argument("-c", "--config", required=True)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--batch", type=int, nargs="+", default=[1, 32],
                   help="batch sizes to compile (1 = the single-slice "
                        "latency program)")
    p.add_argument("--dtype", choices=("float32", "int16"),
                   default="float32")
    p.set_defaults(fn=cmd_warmup)

    p = sub.add_parser("bench", help="throughput benchmark for a config")
    p.add_argument("-c", "--config", required=True)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--iters", type=int, default=20)
    p.set_defaults(fn=cmd_bench)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
