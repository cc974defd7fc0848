"""Clustering-based speaker diarization over a manifest.

End-to-end driver for the diarization stack the reference ships only as
utilities (asr/parts/utils/speaker_utils.py + offline_clustering.py, no
runnable pipeline): VAD -> multiscale subsegments -> speaker embeddings
-> NME-SC clustering -> RTTM (+ DER vs ground truth when the manifest has
`rttm_filepath`).

    python examples/speaker_tasks/diarize.py --config-name=diarization \
        manifest_filepath=input.json out_dir=./rttm_out
    # streaming (OnlineSegmentor sliding-buffer) mode:
    ... diarizer.streaming=true
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from roar_tpu.config.cli import config_runner
from roar_tpu.models.diarization import ClusteringDiarizer, DiarizationConfig
from roar_tpu.utils.logging import get_logger

logger = get_logger(__name__)


@config_runner(config_path=str(Path(__file__).resolve().parents[2] / "configs"))
def main(cfg):
    d = dict(cfg.get("diarizer") or {})
    streaming = bool(d.pop("streaming", False))
    known = {f.name for f in DiarizationConfig.__dataclass_fields__.values()}
    unknown = set(d) - known
    if unknown:
        raise ValueError(f"unknown diarizer config keys: {sorted(unknown)}")
    dcfg = DiarizationConfig(**d)
    diarizer = ClusteringDiarizer(dcfg)
    results = diarizer.diarize_manifest(
        cfg["manifest_filepath"], cfg["out_dir"], streaming=streaming
    )
    ders = [r["der"] for r in results.values() if "der" in r]
    for uniq_id, r in results.items():
        msg = f"{uniq_id}: {len(r['labels'])} turns -> {r['rttm']}"
        if "der" in r:
            msg += f" (DER {r['der']:.4f})"
        logger.info(msg)
    summary = {
        "num_utterances": len(results),
        "mean_der": sum(ders) / len(ders) if ders else None,
        "streaming": streaming,
    }
    out = Path(cfg["out_dir"]) / "summary.json"
    out.write_text(json.dumps(summary, indent=2))
    logger.info(f"summary: {summary}")
    return summary


if __name__ == "__main__":
    main()
