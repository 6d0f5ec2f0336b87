"""cmd: silence slicing (reference: src/cmd/audio_slicer.py)."""
from . import run_task


def main(params: dict):
    from ..service.audio import AudioService

    service = AudioService(params["source_dir"], params["output_dir"])
    kwargs = {k: params[k] for k in
              ("threshold", "min_length", "min_interval", "hop_size",
               "max_silent_kept", "normalize_max", "alpha_mix")
              if k in params}
    return service.slicer(**kwargs)


if __name__ == "__main__":
    run_task(main)
