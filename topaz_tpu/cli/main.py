"""``topaz`` CLI dispatcher.

Same subcommand registry convention as the reference (topaz/main.py:53-148):
each command module exposes ``name``, ``help``, ``add_arguments(parser)``
and ``main(args)``; @argfile flag lists are supported via
fromfile_prefix_chars.
"""

from __future__ import annotations

import argparse


def _command_modules():
    from topaz_tpu.cli.commands import (
        boxes_to_coordinates,
        convert,
        coordinates_to_boxes,
        coordinates_to_eman2_json,
        coordinates_to_star,
        denoise,
        denoise3d,
        downsample,
        extract,
        gui,
        normalize,
        particle_stack,
        precision_recall_curve,
        preprocess,
        scale_coordinates,
        segment,
        serve,
        split,
        star_particles_threshold,
        star_to_coordinates,
        train,
        train_test_split,
        warmup,
        watch,
    )

    return [
        ("Particle picking", [train, segment, extract, precision_recall_curve]),
        ("Streaming", [watch, serve, warmup]),
        ("Image processing", [downsample, normalize, preprocess, denoise, denoise3d]),
        ("File utilities", [convert, split, particle_stack, train_test_split]),
        ("GUI", [gui]),
        ("[Deprecated]", [scale_coordinates, boxes_to_coordinates,
                          star_to_coordinates, coordinates_to_star,
                          coordinates_to_boxes, coordinates_to_eman2_json,
                          star_particles_threshold]),
    ]


def generate_description(module_groups, linewidth=78, indent="  ", delim="  "):
    lines = []
    name_width = max(
        len(m.name) for _, mods in module_groups for m in mods
    )
    desc_width = linewidth - len(indent) - name_width - len(delim)
    for group, mods in module_groups:
        lines.append(group + ":")
        for module in mods:
            name = module.name.ljust(name_width)
            width = 0
            tokens = []
            for token in module.help.split():
                if width + len(token) > desc_width and width > 0:
                    lines.append(indent + name + delim + " ".join(tokens))
                    name = " " * name_width
                    width = 0
                    tokens = []
                tokens.append(token)
                width += len(token) + 1
            if tokens:
                lines.append(indent + name + delim + " ".join(tokens))
        lines.append("")
    return "\n".join(lines)


def _setup_compilation_cache() -> None:
    """Persist compiled programs across CLI invocations, ON BY DEFAULT
    (first compiles on this class of backend can take minutes — the cache
    converts that into a one-time cost per shape).

    Location: $XDG_CACHE_HOME/topaz_tpu/jax_cache (~/.cache/topaz_tpu/...),
    a per-user writable path so read-only installs still cache. Opt out
    with TOPAZ_NO_COMPILE_CACHE=1; an explicit JAX_COMPILATION_CACHE_DIR
    wins (jax reads it natively)."""
    import os

    if os.environ.get("TOPAZ_NO_COMPILE_CACHE"):
        return
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache")
    cache = os.path.join(base, "topaz_tpu", "jax_cache")
    try:
        os.makedirs(cache, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def build_parser() -> argparse.ArgumentParser:
    """The full ``topaz`` argparse tree (also used by tests to validate
    GUI-generated and documented command lines against the real CLI)."""
    import topaz_tpu

    parser = argparse.ArgumentParser(
        prog="topaz",
        formatter_class=argparse.RawDescriptionHelpFormatter,
        fromfile_prefix_chars="@",
    )
    parser.add_argument("--version", action="version", version=topaz_tpu.__version__)

    module_groups = _command_modules()
    subparsers = parser.add_subparsers(
        title="commands", metavar="<command>",
        description=generate_description(module_groups),
    )
    subparsers.required = True
    subparsers.dest = "command"
    for _, mods in module_groups:
        for module in mods:
            sub = subparsers.add_parser(module.name)
            module.add_arguments(sub)
            sub.set_defaults(func=module.main)
    return parser


def main() -> None:
    _setup_compilation_cache()
    args = build_parser().parse_args()
    args.func(args)


if __name__ == "__main__":
    main()
