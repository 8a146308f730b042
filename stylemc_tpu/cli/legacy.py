"""Convert legacy network pickles into the framework's native format.

CLI contract: /root/reference/legacy.py:291-314 — load a (possibly legacy
TF) pickle and re-save in a directly loadable form. Here the output is the
framework-native .npz bundle (config json + flattened params), loadable via
io.native.load_native; NVIDIA .pkl inputs are parsed without executing
embedded code.
"""

from __future__ import annotations

import click


@click.command()
@click.option("--source", required=True, help="Input .pkl", metavar="PATH")
@click.option("--dest", required=True, help="Output .npz", metavar="PATH")
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
    save_native(dest, cfg, params)
    print("Done.")


if __name__ == "__main__":
    main()
