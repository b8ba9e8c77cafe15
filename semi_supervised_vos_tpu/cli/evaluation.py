"""`evaluation` command (reference ``src/evaluation.py:39-44``)."""

from __future__ import annotations

import click

from semi_supervised_vos_tpu.eval.evaluation import evaluation_command_impl


@click.command(name="evaluation")
@click.option("--ground_truth", "-g", type=click.Path(file_okay=False, dir_okay=True), required=True,
              help="Path to ground truth dataset folder.")
@click.option("--computed_results", "-c", type=click.Path(file_okay=False, dir_okay=True), required=True,
              help="Path to computed results.")
def evaluation_command(ground_truth, computed_results):
    evaluation_command_impl(ground_truth, computed_results)
