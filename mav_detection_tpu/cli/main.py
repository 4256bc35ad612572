"""Command-line entry point.

Flag surface matches the reference's ``main.py`` argparse
(``/root/reference/src/main.py:77-89``) plus new TPU-native options
(``--flow-source``, ``--batch-size``). Unlike the reference, ``--algorithm``
is actually wired through to the run configuration.

Usage:
    python -m mav_detection_tpu.cli.main --dataset synthetic \
        --mode FLOW_FOE_CLUSTERING --headless --validate
"""
from __future__ import annotations

import argparse
import logging
import sys
from typing import List, Optional

from mav_detection_tpu.core.config import Mode, RunConfig
from mav_detection_tpu.eval.validator import Validator
from mav_detection_tpu.pipeline.processor import Processor


def get_logger(debug: bool) -> logging.Logger:
    # Deliberate deviation: the reference INVERTS these on the root logger
    # (main.py:64 — INFO when --debug else DEBUG), which floods main.log and
    # the console with jax/matplotlib debug records on every default run.
    # Root stays at WARNING so third-party loggers are quiet; our loggers
    # get DEBUG only under --debug.
    logging.basicConfig(
        filename="main.log", filemode="a",
        format="%(asctime)s.%(msecs)03d %(name)s %(levelname)s %(message)s",
        datefmt="%H:%M:%S", level=logging.WARNING)
    level = logging.DEBUG if debug else logging.INFO
    for name in ("main", "mav_detection_tpu"):
        logging.getLogger(name).setLevel(level)
    logger = logging.getLogger("main")
    if not any(isinstance(h, logging.StreamHandler) for h in logger.handlers):
        logger.addHandler(logging.StreamHandler())
    return logger


def execute(config: RunConfig) -> None:
    config.logger.info(f"Starting: {config}")
    if config.validate and config.uses_nn_for_detection():
        Validator(config).run_validation()
        return
    processor = Processor(config)
    try:
        if config.prepare_dataset:
            processor.convert(config.mode)
        elif config.data_to_yolo:
            processor.annotations_to_yolo()
        elif config.undistort:
            processor.undistort()
        else:
            processor.run_detection()
            Validator(config).run_validation()
    finally:
        processor.release()


def run_all(logger: logging.Logger, args: argparse.Namespace) -> None:
    """Validation sweep over all validation sequences (main.py:38-56).

    Multi-host sharding (SURVEY §2c DCN row): sequences are embarrassingly
    parallel across hosts — each host takes ``sequences[host_index::
    num_hosts]`` with zero cross-host tensor traffic (per-sequence artifacts
    land on disk; figure aggregation reads them afterwards). Set via
    ``--host-index/--num-hosts`` or ``MAV_HOST_INDEX``/``MAV_NUM_HOSTS``
    (e.g. per-host env in a multi-host launcher).
    """
    import os

    num_hosts = args.num_hosts or int(os.environ.get("MAV_NUM_HOSTS", "1"))
    host_index = (args.host_index if args.host_index is not None
                  else int(os.environ.get("MAV_HOST_INDEX", "0")))
    settings = RunConfig(logger=logger).settings
    sequences = list(settings.get("validation_sequences", []))
    mine = sequences[host_index::max(num_hosts, 1)]
    if num_hosts > 1:
        logger.info(f"run-all host {host_index}/{num_hosts}: "
                    f"{len(mine)}/{len(sequences)} sequences")
    for sequence in mine:
        config = RunConfig(
            logger=logger, dataset=args.dataset or "MIDGARD",
            sequence=sequence, mode=str(Mode.FLOW_FOE_CLUSTERING),
            debug=True, validate=True, headless=args.headless,
            flow_source=args.flow_source, batch_size=args.batch_size,
            devices=args.devices,
            engine=getattr(args, "engine", "batch"),
            foe_samples=getattr(args, "foe_samples", 1000),
            use_sparse_of=getattr(args, "use_sparse_of", False))
        execute(config)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Detects MAVs in the dataset using optical flow (TPU-native).")
    parser.add_argument("--dataset", type=str, default="midgard",
                        help="dataset to process")
    parser.add_argument("--sequence", type=str, default="",
                        help="sequence to process")
    parser.add_argument("--mode", type=str, default="FLOW_UV",
                        help="mode to use, see core.config.Mode")
    parser.add_argument("--algorithm", type=str, default="ESSENTIAL",
                        help="ego-motion algorithm, see core.config.Algorithm")
    parser.add_argument("--flow-source", type=str, default="PRECOMPUTED",
                        help="dense flow source: PRECOMPUTED|FARNEBACK|LUCAS_KANADE|RAFT|GROUND_TRUTH")
    parser.add_argument("--batch-size", type=int, default=8,
                        help="frame pairs per device batch")
    parser.add_argument("--devices", type=int, default=0,
                        help="shard frame batches over N devices (data-"
                             "parallel mesh); 0 = single device")
    parser.add_argument("--engine", type=str, default="batch",
                        help="frame engine: batch (fused frame batches), "
                             "scan (one lax.scan program with carried "
                             "temporal state), chunked (time chunks over "
                             "the mesh; needs --devices), spatial (each "
                             "frame's flow solve row-sharded over the mesh "
                             "for hi-res latency; needs --devices)")
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--prepare-dataset", action="store_true",
                        help="prepares the YOLOv4 training dataset")
    parser.add_argument("--validate", action="store_true",
                        help="validate the detection results")
    parser.add_argument("--headless", action="store_true",
                        help="do not use UIs")
    parser.add_argument("--run-all", action="store_true",
                        help="run all configurations")
    parser.add_argument("--num-hosts", type=int, default=0,
                        help="shard --run-all sequences over N hosts "
                             "(or MAV_NUM_HOSTS)")
    parser.add_argument("--host-index", type=int, default=None,
                        help="this host's index for --run-all sharding "
                             "(or MAV_HOST_INDEX)")
    parser.add_argument("--foe-samples", type=int, default=1000,
                        help="dense-FoE sampling budget (reference N=1000); "
                             "raise at high resolutions for a tighter vote")
    parser.add_argument("--use-sparse-of", action="store_true",
                        help="fit the homography-branch transform on sparse "
                             "LK feature tracks instead of sampled flow")
    parser.add_argument("--data-to-yolo", action="store_true",
                        help="convert annotations to the YOLO format")
    parser.add_argument("--undistort", action="store_true",
                        help="undistort original images")
    return parser


def main(argv: Optional[List[str]] = None) -> None:
    args = build_parser().parse_args(argv)
    logger = get_logger(args.debug)
    if args.run_all:
        run_all(logger, args)
        return
    config = RunConfig(
        logger=logger, dataset=args.dataset, sequence=args.sequence,
        mode=args.mode, algorithm=args.algorithm,
        flow_source=args.flow_source, batch_size=args.batch_size,
        devices=args.devices, engine=args.engine,
        use_sparse_of=args.use_sparse_of,
        foe_samples=args.foe_samples,
        debug=args.debug, prepare_dataset=args.prepare_dataset,
        validate=args.validate, headless=args.headless,
        data_to_yolo=args.data_to_yolo, undistort=args.undistort)
    execute(config)


if __name__ == "__main__":
    main()
