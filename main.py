"""CLI entry point — same surface as the reference ``main.py``:
``python main.py {train,inference,validation,evaluation}``.
"""

import click

from semi_supervised_vos_tpu.cli.evaluation import evaluation_command
from semi_supervised_vos_tpu.cli.inference import inference_command


@click.group(name="cli")
def cli():
    pass


cli.add_command(inference_command)
cli.add_command(evaluation_command)

try:
    from semi_supervised_vos_tpu.cli.train import train_command

    cli.add_command(train_command)
except ImportError:
    pass
try:
    from semi_supervised_vos_tpu.cli.validation import validation_command

    cli.add_command(validation_command)
except ImportError:
    pass


if __name__ == "__main__":
    cli()
