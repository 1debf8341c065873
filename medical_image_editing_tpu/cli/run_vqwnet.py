"""Training/test CLI.

Behavioral spec: reference `src/run_vqwnet.py` — argparse flags `-c` (config
JSON), `-m train|test`, `-w` (MultiWindowTrainer), `-v` (VQGAN trainer)
(`:132-139`); builds Logger + checkpoint saver, selects the trainer flavor
(`:82-88`), optional resume (`:90-100,126`), seeds (`:143-144`), then
fit/test (`:151-155`). Slack image upload (`:34-49`) is gated on slack_sdk
availability (the reference has the same soft dependency — it's missing from
its requirements.txt).
"""

import argparse
import logging
import os
import random
import warnings

log = logging.getLogger(__name__)


class ImageUploader:
    """Slack uploader. Spec: `run_vqwnet.py:34-49`; no-op without slack_sdk
    or TOKEN/CHANNEL_ID env vars."""

    def __init__(self):
        self._client = None
        token = os.environ.get("TOKEN")
        self._channel = os.environ.get("CHANNEL_ID")
        if token and self._channel:
            try:
                from slack_sdk import WebClient  # type: ignore

                self._client = WebClient(token=token)
            except ImportError:
                warnings.warn("slack_sdk not installed; Slack upload disabled")

    def send_image(self, file_path, message):
        if self._client is None:
            return
        try:
            self._client.files_upload(
                channels=self._channel, initial_comment=str(message), file=file_path
            )
        except Exception as e:  # parity: log-and-continue (`:47-49`)
            log.error("Error uploading file: %s", e)


def build_trainer(config, args, rng_key=None):
    from ..train.trainer import Trainer
    from ..utils.logging import Logger

    monitoring_metrics = list(config.run.monitoring_metrics or [])
    uploader = ImageUploader()
    logger = Logger(
        save_dir=str(config.save.save_dir),
        config=config,
        name=str(config.save.study_name),
        monitoring_metrics=monitoring_metrics,
        uploader=uploader,
    )
    trainer = Trainer(
        config,
        logger=logger,
        uploader=uploader,
        use_multi_window=bool(args.multiwindow),
        use_vqgan=bool(args.vqgan),
        rng_key=rng_key,
    )
    return trainer, logger


def main(argv=None):
    parser = argparse.ArgumentParser(description="Editable medical image generation")
    parser.add_argument("-c", "--config", help="config", required=True)
    parser.add_argument("-m", "--mode", default="train", type=str)
    parser.add_argument("-w", "--multiwindow", action="store_true")
    parser.add_argument("-v", "--vqgan", action="store_true")
    parser.add_argument("--max-steps", type=int, default=None,
                        help="smoke-run cap (not in the reference CLI)")
    args = parser.parse_args(argv)

    from . import cli_setup

    cli_setup("run-vqwnet")

    from ..utils.config import getattr_else_none as g
    from ..utils.config import load_dotenv, load_json

    load_dotenv()  # TOKEN / CHANNEL_ID etc. (`run_vqwnet.py:29-31`)
    from ..utils.seed import init_seed

    config = load_json(args.config)

    from ..utils.config import validate_config

    for w in validate_config(config, multi_window=bool(args.multiwindow),
                             vqgan=bool(args.vqgan)):
        warnings.warn(w)

    seed = g(config.run, "seed", None) or random.randint(1, 10000)
    key, seed_list = init_seed(
        list(g(config.run, "seed_list", []) or []) or [seed]
    )
    print(f"Seed: {seed}")

    trainer, logger = build_trainer(config, args, rng_key=key)
    logger.log_hyperparams(seed_list)

    if args.mode == "train":
        state = trainer.fit(max_steps=args.max_steps)
    elif args.mode == "test":
        state = trainer.init_state(_infer_image_size(config))
        resume = g(config.run, "resume_checkpoint", None)
        if resume:
            from ..utils.checkpoint import CheckpointManager

            state = CheckpointManager(str(resume)).restore(state)
            print(f"Loading model from {resume}")
        trainer.test(state, save_dir_path=logger.log_dir)
    else:
        raise SystemExit(f"unknown mode {args.mode!r}")
    return 0


def _infer_image_size(config) -> int:
    from ..utils.config import getattr_else_none as g

    size = g(config.dataset, "image_size", None)
    if size is None:
        return 256
    return int(size[0]) if isinstance(size, (list, tuple)) else int(size)


if __name__ == "__main__":
    raise SystemExit(main())
