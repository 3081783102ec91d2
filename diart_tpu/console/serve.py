"""``diart-tpu-serve``: websocket diarization server.

Parity + upgrade over ``/root/reference/src/diart/console/serve.py``: the
reference serves ONE client per process; this server multiplexes up to
``--num-streams`` concurrent clients into one fused on-device engine.
"""

import argparse

from .. import argdoc
from .. import models as m
from .. import utils
from ..parallel import MultiStreamEngine
from ..runtime.server import StreamingServer
from .stream import (
    add_common_model_args,
    add_common_pipeline_args,
    apply_precision_arg,
)


def run():
    parser = argparse.ArgumentParser()
    parser.add_argument("--host", default="127.0.0.1", type=str, help="Server host")
    parser.add_argument("--port", default=7007, type=int, help="Server port")
    add_common_model_args(parser)
    add_common_pipeline_args(parser)
    parser.add_argument(
        "--num-streams",
        default=16,
        type=int,
        help=f"{argdoc.NUM_STREAMS}. Defaults to 16",
    )
    parser.add_argument(
        "--cohorts",
        default=1,
        type=int,
        help="Time-multiplex N independent stream cohorts onto the chip "
        "(capacity = N * --num-streams concurrent clients). Each cohort "
        "is its own device state sharing the one compiled engine; in "
        "--realtime mode cohorts tick at staggered phases within the "
        "step period. One 256-stream hop costs ~13 ms of a 500 ms "
        "period, so a single chip sustains many cohorts "
        "(docs/SERVING.md capacity planning)",
    )
    parser.add_argument(
        "--mesh",
        default=0,
        type=int,
        help="Shard the stream batch over N devices along a 'streams' mesh "
        "axis (stream-level data parallelism over ICI); provisions an "
        "N-virtual-device CPU mesh when fewer real devices exist",
    )
    parser.add_argument(
        "--int16-transfer",
        action="store_true",
        help="Ship int16 PCM blocks to the device (half the host->device "
        "bytes per hop; ~96 dB quantization floor, dequantized on device)",
    )
    parser.add_argument(
        "--pipelined",
        action="store_true",
        help="Overlap hop k's device fetch + RTTM assembly with hop k+1's "
        "dispatch. Measured as an overload-throughput mode: more replies "
        "under overload, but higher wire latency at or below capacity on "
        "single-core hosts (PERF.md round-4 serving)",
    )
    parser.add_argument(
        "--no-binarize-on-device",
        action="store_true",
        help="Fetch raw aggregated scores per hop instead of the "
        "device-binarized packed bitmap (32x the device->host bytes; the "
        "bitmap is exact-parity and is what lifts the cohort serving "
        "ceiling to the device-duty wall — PERF.md round-5 serving). "
        "Only useful for A/Bs and debugging",
    )
    parser.add_argument(
        "--realtime",
        action="store_true",
        help="Tick once per step of wall clock instead of polling for "
        "arrived audio every 5 ms: one hop per step period regardless of "
        "client arrival phase (the fewest host->device transfers; adds up "
        "to one tick of alignment latency). Default: fast-poll",
    )
    parser.add_argument(
        "--coalesce-ms",
        default=0.0,
        type=float,
        help="Hold a partial client wave up to this many ms so one "
        "synchronized wave dispatches as ONE hop (fewer full-batch "
        "host->device transfers). Default 0: the hold was measured to "
        "cost more wire latency than the transfer saving pays back "
        "(PERF.md round-4 serving); raise only when host->device "
        "transfer is the measured bottleneck",
    )
    args = parser.parse_args()
    apply_precision_arg(args)
    if args.realtime and args.coalesce_ms:
        parser.error(
            "--coalesce-ms only applies to the fast-poll ticker; "
            "--realtime already dispatches one hop per step"
        )

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    mesh = None
    if args.mesh:
        if args.num_streams % args.mesh:
            parser.error(
                f"--num-streams ({args.num_streams}) must be divisible by "
                f"--mesh ({args.mesh})"
            )
        from ..parallel import streams_mesh

        mesh = streams_mesh(args.mesh)

    hf_token = utils.parse_hf_token_arg(args.hf_token)
    segmentation = m.SegmentationModel.from_pretrained(
        args.segmentation, hf_token,
        powerset=tuple(args.powerset) if args.powerset else None,
    )
    embedding = m.EmbeddingModel.from_pretrained(args.embedding, hf_token)

    engine = MultiStreamEngine(
        segmentation=segmentation,
        embedding=embedding,
        duration=args.duration,
        step=args.step,
        latency=args.latency,
        sample_rate=args.sample_rate,
        tau_active=args.tau_active,
        rho_update=args.rho_update,
        delta_new=args.delta_new,
        gamma=args.gamma,
        beta=args.beta,
        max_speakers=args.max_speakers,
        normalize_embedding_weights=args.normalize_embedding_weights,
        batch_size=args.num_streams,
        mesh=mesh,
    )
    server = StreamingServer(
        engine,
        tau_active=args.tau_active,
        host=args.host,
        port=args.port,
        realtime=args.realtime,
        quantize_transfer=args.int16_transfer,
        pipelined=args.pipelined,
        coalesce=args.coalesce_ms / 1000.0,
        cohorts=args.cohorts,
        binarize_on_device=not args.no_binarize_on_device,
    )
    try:
        server.run()
    except KeyboardInterrupt:
        server.close()


if __name__ == "__main__":
    run()
