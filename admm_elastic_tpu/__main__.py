"""Generic headless scene runner:

    python -m admm_elastic_tpu scene.xml [--steps N] [--export DIR]
        [--render DIR] [--checkpoint FILE] [--resume FILE]
        [-dt s] [-it n] [-v level]

Loads any scene in the reference XML dialect, steps it, and optionally dumps
OBJ frames / PNG renders / a state checkpoint.
"""

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(prog="admm_elastic_tpu")
    ap.add_argument("scene")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--export", default=None, help="OBJ frame directory")
    ap.add_argument("--render", default=None, help="PNG frame directory")
    ap.add_argument("--every", type=int, default=5, help="frame dump interval")
    ap.add_argument("--checkpoint", default=None, help="save final state npz")
    ap.add_argument("--resume", default=None, help="load state npz before run")
    ap.add_argument("--viewer", default=None,
                    help="record an interactive HTML viewer (one file, "
                         "orbit/zoom/play controls; frames every --every "
                         "steps) instead of the plain stepping loop")
    ap.add_argument("--sharded", type=int, default=None, metavar="N",
                    help="run the scene element-sharded over N devices "
                         "(boundary-halo O(cut) exchange, "
                         "parallel.halo_spmd). Needs N visible devices "
                         "— on a CPU host set XLA_FLAGS="
                         "--xla_force_host_platform_device_count=N")
    ap.add_argument("--live", type=int, default=None, metavar="PORT",
                    help="serve the LIVE simulation on this port "
                         "(browser: orbit/zoom, shift-drag grabs "
                         "vertices, space pauses — live.LiveViewer); "
                         "runs until --steps simulation steps elapse "
                         "(0 = until Ctrl-C)")
    args, rest = ap.parse_known_args(argv)

    from .scene import SimContext

    ctx = SimContext()
    ctx.load(args.scene)
    ctx.system.settings.parse_args(rest)
    if args.live is not None:
        if args.viewer or args.export or args.render:
            ap.error("--live cannot be combined with "
                     "--viewer/--export/--render")
        from .live import LiveViewer

        if args.sharded:
            import jax

            if len(jax.devices()) < args.sharded:
                ap.error(
                    f"--sharded {args.sharded}: only "
                    f"{len(jax.devices())} devices visible"
                )
            if ctx.system.settings.global_solver in ("auto", "dense"):
                ctx.system.settings.global_solver = "ell"
            ctx.system.settings.lattice_fast_path = False
        lv = LiveViewer.for_context(ctx)
        ctx.initialize()
        if args.resume:
            from .utils import load_state

            ctx.system.state = load_state(
                args.resume, dtype=ctx.system.settings.dtype,
                like=ctx.system.state,
            )
        if args.sharded:
            import jax

            from .parallel.halo_spmd import HaloSpmdSystem

            lv.attach_spmd(HaloSpmdSystem(
                ctx.system, jax.make_mesh((args.sharded,), ("elem",))))
        lv.serve(port=args.live,
                 max_steps=args.steps if args.steps > 0 else None)
        if args.checkpoint:
            from .utils import save_state

            if lv.spmd is not None:
                lv.spmd.detach()  # sharded state -> system state
            save_state(args.checkpoint, ctx.system.state)
            print(f"checkpoint: {args.checkpoint}")
        return 0
    if args.sharded:
        import jax

        if len(jax.devices()) < args.sharded:
            ap.error(
                f"--sharded {args.sharded}: only {len(jax.devices())} "
                "devices visible (set XLA_FLAGS="
                f"--xla_force_host_platform_device_count={args.sharded} "
                "for a virtual CPU mesh)"
            )
        if args.live is not None or args.viewer:
            ap.error("--sharded cannot be combined with --live/--viewer")
        # the halo path needs an iterative global solve
        if ctx.system.settings.global_solver in ("auto", "dense"):
            ctx.system.settings.global_solver = "ell"
        ctx.system.settings.lattice_fast_path = False
        ctx.initialize()
        if args.resume:
            from .utils import load_state

            ctx.system.state = load_state(
                args.resume, dtype=ctx.system.settings.dtype,
                like=ctx.system.state,
            )
        from .parallel.halo_spmd import HaloSpmdSystem

        spmd = HaloSpmdSystem(
            ctx.system, jax.make_mesh((args.sharded,), ("elem",))
        )
        import numpy as np

        for i in range(args.steps):
            spmd.step()
            if (args.export or args.render) and i % args.every == 0:
                spmd.detach()
                ctx.update()
                if args.export:
                    ctx.export_obj(args.export, i)
                if args.render:
                    import os

                    from .viz import render_frame

                    render_frame(ctx.objects, os.path.join(
                        args.render, f"frame_{i:05d}.png"))
        spmd.detach()
        ctx.update()
        x = ctx.system.x
        stats = spmd.comm_stats()
        print(
            f"done (sharded x{args.sharded}): {args.steps} steps, "
            f"finite={bool(np.isfinite(x).all())}, "
            f"{stats['exchange_rows']} exchange rows, "
            f"{stats['bytes_per_cg_iter']} comm bytes/CG-iter"
        )
        if args.checkpoint:
            from .utils import save_state

            save_state(args.checkpoint, ctx.system.state)
            print(f"checkpoint: {args.checkpoint}")
        return 0

    ctx.initialize()

    if args.resume:
        from .utils import load_state

        ctx.system.state = load_state(
            args.resume, dtype=ctx.system.settings.dtype, like=ctx.system.state
        )

    if args.viewer and (args.export or args.render):
        ap.error("--viewer cannot be combined with --export/--render "
                 "(the viewer records its own frames)")
    if args.viewer and args.steps > 0:
        # record a frame every --every steps for exactly --steps steps
        # (remainder stepped un-recorded), then fall through to the
        # summary/checkpoint handling below
        from .viewer import record_html_viewer

        every = max(1, min(args.every, args.steps))
        n_frames = max(1, args.steps // every)
        p = record_html_viewer(ctx, args.viewer, n_frames,
                               steps_per_frame=every)
        for _ in range(args.steps - n_frames * every):
            ctx.step()
        print(f"viewer: {p}")
    elif args.viewer:
        print("viewer: skipped (--steps 0 records nothing)")

    for i in range(0 if args.viewer else args.steps):
        ctx.step()
        if (args.export or args.render) and i % args.every == 0:
            ctx.update()
            if args.export:
                ctx.export_obj(args.export, i)
            if args.render:
                from .viz import render_frame

                import os

                render_frame(
                    ctx.objects, os.path.join(args.render, f"frame_{i:05d}.png")
                )

    ctx.update()
    import numpy as np

    x = ctx.system.x
    print(
        f"done: {args.steps} steps, t={ctx.system.elapsed_s:.2f}s, "
        f"finite={bool(np.isfinite(x).all())}, "
        f"bbox=({np.round(x.min(0),3)}, {np.round(x.max(0),3)})"
    )
    if args.checkpoint:
        from .utils import save_state

        save_state(args.checkpoint, ctx.system.state)
        print(f"checkpoint: {args.checkpoint}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
