"""Animate a logged registration run (CSV trace -> GIF).

Analog of the reference's experiments/gif.py on the current API. The CSV must
carry pose columns r1 r2 r3 tx ty tz (as written by a customized
registration.py trace); runs without pose columns can't be animated.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import click
import numpy as np

import jax
import pandas as pd

from diffdrr_tpu import DRR, load_example_ct
from diffdrr_tpu.viz import animate


@click.command()
@click.option("--cpu/--no-cpu", default=False, help="Force CPU execution")
@click.argument("csv_path")
@click.argument("out_path")
@click.option("--height", default=128)
@click.option("--volume-size", default=256)
def main(cpu, csv_path, out_path, height, volume_size):
    if cpu:
        jax.config.update("jax_platforms", "cpu")
    df = pd.read_csv(csv_path)
    required = {"r1", "r2", "r3", "tx", "ty", "tz"}
    if not required.issubset(df.columns):
        raise click.ClickException(
            f"{csv_path} lacks pose columns {sorted(required)}; "
            "log poses during registration to animate them."
        )
    subject = load_example_ct(
        shape=(volume_size, volume_size, max(16, volume_size // 4))
    )
    drr = DRR(subject, sdd=1020.0, height=height, delx=2.0, renderer="trilinear")
    out = animate(out_path, df, drr)
    click.echo(f"wrote {out}")


if __name__ == "__main__":
    main()
