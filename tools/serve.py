#!/usr/bin/env python
"""Production serving mode: a warm-model HTTP endpoint for guided restoration.

The CLI pipelines pay compile + model-load once per process; for serving,
that cost must be paid once per *deployment*. This server loads the model,
compiles the guided chain at startup (persistent-cache-backed), then serves:

    POST /restore          body: PNG/JPEG bytes -> multipart-free JSON
                           {"rgb_png": <b64>, "depth_png": <b64>,
                            "phi": {...}, "ms": N}
    GET  /healthz          200 once the executable is warm

Single-threaded by design: one TPU chip serves one chain at a time and the
axon relay serializes device work anyway; run one server per chip and load-
balance in front for fleets (images are embarrassingly parallel).

    python tools/serve.py -c configs/osmosis_sample_fast_config.yaml --port 8200
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import sys
import time
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


class Restorer:
    """Owns the warm compiled guided chain + pre/post processing."""

    def __init__(self, config_file: str, warmup: bool = True):
        import jax
        import jax.numpy as jnp

        from osmosis_tpu import config as C
        from osmosis_tpu.diffusion.guided import GuidanceConfig, guided_sample_loop
        from osmosis_tpu.diffusion.sampler import SamplerConfig
        from osmosis_tpu.diffusion.schedules import make_schedule
        from osmosis_tpu.guidance.noise import get_noiser
        from osmosis_tpu.guidance.operators import get_operator
        from osmosis_tpu.guidance.phi_optim import make_phi_optimizer
        from osmosis_tpu.models.convert import cast_params_half, load_unet_params
        from osmosis_tpu.models.unet import UNetModel, unet_config_from_yaml
        from osmosis_tpu.utils.compilation_cache import enable as _enable

        _enable()
        args = C.arguments_from_file(config_file)
        self.args = args
        self.image_size = args.unet_model["image_size"]

        dtype = jnp.bfloat16 if args.unet_model.get("use_fp16") else jnp.float32
        ucfg = unet_config_from_yaml(
            args.unet_model, dtype=dtype,
            remat=bool(args.unet_model.get("use_checkpoint", False)),
        )
        model = UNetModel(ucfg)
        params = load_unet_params(args.unet_model.get("model_path", ""), ucfg)
        if ucfg.dtype == jnp.bfloat16:
            params = cast_params_half(params)
        self.params = jax.device_put(params, jax.local_devices()[0])

        mc = args.measurement
        op_kwargs = {k: v for k, v in mc["operator"].items() if k != "name"}
        self.operator = get_operator(mc["operator"]["name"], batch_size=1, **op_kwargs)
        self.noiser = get_noiser(**mc["noise"])
        gcfg = GuidanceConfig.from_config(
            args.conditioning["method"], args.conditioning["params"],
            args.sample_pattern, args.aux_loss,
            noiser_name=mc["noise"]["name"],
        )
        d = args.diffusion
        schedule = make_schedule(
            noise_schedule=d["noise_schedule"], steps=d["steps"],
            timestep_respacing=d.get("timestep_respacing", ""),
            rescale_timesteps=d.get("rescale_timesteps", False),
        )
        scfg = SamplerConfig(
            sampler=d["sampler"], model_mean_type=d["model_mean_type"],
            model_var_type=d["model_var_type"],
            dynamic_threshold=d.get("dynamic_threshold", False),
            clip_denoised=d.get("clip_denoised", False),
        )
        phi0 = {k: jnp.asarray(v) for k, v in self.operator.phi_init().items()}
        opt0 = make_phi_optimizer(
            self.operator.optimizer, self.operator.etas()
        ).init(phi0)
        self._phi0, self._opt0 = phi0, opt0

        def _run(params_, x_init, y, key):
            def model_fn(x, t):
                return model.apply(params_, x, t)

            return guided_sample_loop(
                model_fn, schedule, x_init, y, key, self.operator, gcfg, scfg,
                sample_pattern=args.sample_pattern,
                phi_init=phi0, opt_state_init=opt0,
            )

        self._jax = jax
        self._run = jax.jit(_run)
        self.warm = False
        if warmup:
            self.warmup()

    def warmup(self):
        jax = self._jax
        hw = self.image_size
        y = self._jax.numpy.zeros((1, hw, hw, 3))
        x = jax.random.normal(jax.random.key(0), (1, hw, hw, 4))
        t0 = time.perf_counter()
        res = self._run(self.params, x, y, jax.random.key(1))
        np.asarray(res.pred_xstart)
        print(f"[serve] warm in {time.perf_counter() - t0:.1f}s", file=sys.stderr)
        self.warm = True

    def restore(self, img_bytes: bytes, seed: int = 0) -> dict:
        import jax

        from osmosis_tpu.data import postprocess as P
        from osmosis_tpu.data.transforms import preprocess_image
        from PIL import Image

        t0 = time.perf_counter()
        img = Image.open(io.BytesIO(img_bytes)).convert("RGB")
        ref = preprocess_image(img, self.image_size)[None]  # [1,H,W,3] in [-1,1]
        y = self.noiser(self._jax.numpy.asarray(ref), key=jax.random.key(seed + 1))
        if getattr(self.args, "degamma_input", False):
            # same linearization, same noise-then-degamma order as the CLI
            # pipeline (restore.py) — the haze preset guides against the
            # degamma'd measurement
            from osmosis_tpu.data import transforms as TR

            y = self._jax.numpy.asarray(TR.degamma(np.asarray(y)))

        key = jax.random.key(seed)
        x = jax.random.normal(jax.random.fold_in(key, 0), ref.shape[:3] + (4,))
        res = self._run(self.params, x, y, jax.random.fold_in(key, 1))

        x0 = np.asarray(res.pred_xstart)[0]
        rgb01 = P.clip01(P.to_01(x0[..., 0:3]))
        depth = P.min_max_norm_range_percentile(
            x0[..., 3], percent_low=0.03, percent_high=0.99
        )
        depth_color = P.depth_to_color(depth)

        def png_b64(a01):
            buf = io.BytesIO()
            Image.fromarray((np.clip(a01, 0, 1) * 255).astype(np.uint8)).save(
                buf, format="PNG"
            )
            return base64.b64encode(buf.getvalue()).decode()

        phi = {k: np.asarray(v)[0].tolist() for k, v in res.phi.items()}
        return {
            "rgb_png": png_b64(rgb01),
            "depth_png": png_b64(depth_color),
            "phi": phi,
            "final_loss": float(np.asarray(res.sep_loss)[-1].mean()),
            "ms": round((time.perf_counter() - t0) * 1e3, 1),
        }


def make_handler(restorer: Restorer):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *a):
            print("[serve]", fmt % a, file=sys.stderr)

        def _send(self, code, payload: bytes, ctype="application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def do_GET(self):
            if self.path == "/healthz":
                body = json.dumps({"warm": restorer.warm}).encode()
                self._send(200 if restorer.warm else 503, body)
            else:
                self._send(404, b'{"error": "not found"}')

        def do_POST(self):
            if self.path.split("?")[0] != "/restore":
                self._send(404, b'{"error": "not found"}')
                return
            n = int(self.headers.get("Content-Length", 0))
            if n <= 0 or n > 64 * 1024 * 1024:
                self._send(400, b'{"error": "bad content length"}')
                return
            body = self.rfile.read(n)
            seed = 0
            if "seed=" in self.path:
                try:
                    seed = int(self.path.split("seed=")[1].split("&")[0])
                except ValueError:
                    self._send(400, b'{"error": "bad seed"}')
                    return
            try:
                out = restorer.restore(body, seed=seed)
            except Exception as e:  # bad image etc.
                self._send(400, json.dumps({"error": str(e)}).encode())
                return
            self._send(200, json.dumps(out).encode())

    return Handler


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config_file",
                    default="configs/osmosis_sample_fast_config.yaml")
    ap.add_argument("--port", type=int, default=8200)
    ap.add_argument("--host", default="127.0.0.1")
    args = ap.parse_args()

    restorer = Restorer(args.config_file)
    srv = HTTPServer((args.host, args.port), make_handler(restorer))
    print(f"[serve] listening on {args.host}:{args.port}", file=sys.stderr)
    srv.serve_forever()


if __name__ == "__main__":
    main()
