"""Convert network checkpoints between formats.

CLI contract: /root/reference/legacy.py:291-314 — load a (possibly legacy
TF) pickle and re-save in a directly loadable form. Inputs: NVIDIA .pkl
(parsed without executing embedded code), legacy TF pickles, rosinality
.pt, or framework-native .npz. Output format follows the --dest extension:
.npz = framework-native bundle (config json + flattened params),
.pt = rosinality-layout torch checkpoint (loadable by rosinality/e4e
torch tooling — the export direction of io/rosinality.py's name map).
"""

from __future__ import annotations

import click


@click.command()
@click.option("--source", required=True, metavar="PATH",
              help="Input .pkl / .pt / .npz")
@click.option("--dest", required=True, metavar="PATH",
              help="Output .npz (native) or .pt (rosinality)")
@click.option("--key", default="G_ema", show_default=True)
@click.option("--force-fp16", is_flag=True, default=False, show_default=True,
              help="force num_fp16_res=4 + conv_clamp=256 "
                   "(reference legacy.py:39-55)")
def main(source, dest, key, force_fp16):
    from ..io import load_generator
    from ..io.native import save_native

    print(f'Loading "{source}"...')
    cfg, params = load_generator(source, key=key, force_fp16=force_fp16)
    print(f'Saving "{dest}"...')
    if dest.endswith((".pt", ".pth")):
        from ..io.export import save_rosinality_pt

        save_rosinality_pt(dest, cfg, params)
    else:
        save_native(dest, cfg, params)
    print("Done.")


if __name__ == "__main__":
    main()
