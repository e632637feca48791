"""Trainers: VQGanVAETrainer (GAN loop) and MaskGitTrainer.

TPU-native rebuild of `/root/reference/muse_maskgit_pytorch/trainers.py`
(`VQGanVAETrainer`, :117-415) plus the MaskGit trainer the reference never
finished (its README Todo admits "hook up accelerate training code for
maskgit" is open — README.md:235; MaskGit training upstream is a bare
`loss.backward()` in user code).

Design (SURVEY.md §7): where the reference's step does a device sync per
micro-batch (`loss.item()`, trainers.py:324,345) and drives two optimizers,
EMA and grad-accum from host python, here the ENTIRE step — generator
micro-batch scan, discriminator micro-batch scan, both optax updates,
gradient clipping, EMA — is ONE jitted function with donated state. Data
parallelism is a `jax.sharding.Mesh` with the batch sharded on the `data`
axis; gradient all-reduce is emitted by XLA from the shardings (no
DDP/NCCL — reference trainers.py:322 equivalent is implicit).

Faithful knobs: lr 3e-4, grad_accum_every, max_grad_norm, EMA
(beta/after/every), apply_grad_penalty_every, valid split (frac+seed),
save_results_every / save_model_every, results_folder. One deliberate fix:
the reference's `apply_grad_penalty_every` knob is dead code (the flag is
passed to the generator call where it is ignored, trainers.py:315-318, while
the discriminator call always applies the penalty, vqgan_vae.py:469-486);
here the knob actually gates the penalty on the discriminator step.
"""

from __future__ import annotations

import functools
from pathlib import Path
from shutil import rmtree
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx

from muse_maskgit_pytorch_tpu.models.maskgit import MaskGit
from muse_maskgit_pytorch_tpu.models.vqgan_vae import VQGanVAE
from jax.sharding import NamedSharding, PartitionSpec as P

from muse_maskgit_pytorch_tpu.parallel.mesh import (
    DATA_AXIS,
    create_mesh,
    is_main_process,
    sharded_state_bytes,
    state_shardings,
)


def _state_jit_kwargs(trainer):
    """jit kwargs pinning the step's output state to the FSDP shardings (and
    the logs to replicated). Without the pin, XLA may resolve the updated
    state to different layouts and the sharding decays after one step."""
    if getattr(trainer, "state_shardings", None) is None:
        return {}
    replicated = NamedSharding(trainer.mesh, P())
    return dict(out_shardings=(trainer.state_shardings, replicated))


def _maybe_shard_state(trainer, shard_state: bool, rules=None):
    """FSDP/ZeRO: place the trainer's state pytree with each big leaf sharded
    over the mesh's fsdp (or data) axis, and return the NamedSharding tree
    (used to pin the jitted step's out_shardings so updated state stays
    sharded). Returns None when sharding is off or the mesh is trivial.

    The reference replicates the full params+Adam(+EMA) state per device
    (DDP, trainers.py:147-159); at the reference VAE scale that 5.8G is what
    caps one v5e at micro-batch 4 (BASELINE.md). Sharded, per-chip state is
    total/axis_size and XLA all-gathers weights into the forward over ICI.
    """
    if not shard_state:
        return None
    mesh = trainer.mesh
    if getattr(mesh, "size", 1) <= 1:
        return None
    shardings = state_shardings(trainer.state, mesh, base_rules=rules)
    trainer.state = jax.tree.map(jax.device_put, trainer.state, shardings)
    total, per_dev = sharded_state_bytes(trainer.state)
    trainer.print(
        f"sharded train state over mesh {dict(mesh.shape)}: "
        f"{total / 1e9:.2f}G total, {per_dev / 1e9:.2f}G per device"
    )
    return shardings


def _put_microbatched(arr, mesh):
    """Place a (accum, batch, ...) host array with the batch dim (axis 1)
    sharded over the mesh's data axis — this is what makes the jitted step
    data-parallel (XLA adds the gradient psum from the sharding)."""
    arr = jnp.asarray(arr)
    if getattr(mesh, "size", 1) <= 1 or DATA_AXIS not in mesh.shape:
        return arr
    if arr.shape[1] % mesh.shape[DATA_AXIS] != 0:
        # batch not divisible by the data axis: the compiler will replicate,
        # silently forfeiting data parallelism — make the 8x cliff audible
        import warnings

        warnings.warn(
            f"batch {arr.shape[1]} not divisible by data-parallel size "
            f"{mesh.shape[DATA_AXIS]}; batch left UNSHARDED (replicated). "
            "Pick batch_size divisible by the mesh's data axis.",
            stacklevel=3,
        )
        return arr
    spec = P(None, DATA_AXIS, *([None] * (arr.ndim - 2)))
    return jax.device_put(arr, NamedSharding(mesh, spec))
from muse_maskgit_pytorch_tpu.training.data import (
    DataLoader,
    ImageDataset,
    cycle,
    make_grid,
    prefetch_iterator,
    save_image,
    split_dataset,
)
from muse_maskgit_pytorch_tpu.training.ema import ema_init, ema_update
from muse_maskgit_pytorch_tpu.training.preemption import PreemptionGuard
from muse_maskgit_pytorch_tpu.utils.checkpoint import (
    latest_step,
    load_train_state,
    save_train_state,
    wait_for_saves,
)
from muse_maskgit_pytorch_tpu.utils.metrics import MetricsLogger, StepTimer
from muse_maskgit_pytorch_tpu.utils.helpers import default, exists

Array = jax.Array


@functools.partial(jax.jit, static_argnames=("graphdef",))
def _eval_recon_jit(graphdef, states, images):
    """Eval-grid reconstruction forward, clipped to [0, 1]. Params enter as
    ARGUMENTS (not jit-closure constants), so one compilation serves every
    eval and the tunnel never ships weights inside the HLO."""
    model = nnx.merge(graphdef, *states)
    return jnp.clip(model(images, train=False), 0.0, 1.0)


def lr_schedule(
    lr: float,
    warmup_steps: int = 0,
    decay_steps: Optional[int] = None,
    end_lr_ratio: float = 0.1,
):
    """Optional linear warmup + cosine decay. Returns the constant `lr` when
    both knobs are off (the reference's fixed-lr behavior, trainers.py:173),
    else an optax schedule. The schedule's step count lives inside the
    optimizer state, so checkpoint resume continues it exactly."""
    if not warmup_steps and decay_steps is None:
        return lr
    scheds, bounds = [], []
    if warmup_steps:
        scheds.append(optax.linear_schedule(0.0, lr, warmup_steps))
        bounds.append(warmup_steps)
    if decay_steps is not None:
        scheds.append(optax.cosine_decay_schedule(lr, decay_steps, alpha=end_lr_ratio))
    else:
        scheds.append(optax.constant_schedule(lr))
    return scheds[0] if len(scheds) == 1 else optax.join_schedules(scheds, bounds)


def _make_optimizer(lr, max_grad_norm: Optional[float]):
    """`lr`: float or optax schedule (see `lr_schedule`)."""
    chain = []
    if exists(max_grad_norm):
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(optax.adam(lr))
    return optax.chain(*chain)


# param filters: discriminator vs generator vs frozen (VGG)
_DISCR = nnx.All(nnx.Param, nnx.PathContains("discr"))
_VGG = nnx.All(nnx.Param, nnx.PathContains("_vgg"))
_GEN = nnx.Param  # whatever Param is left after the first two filters
# explicit form of _GEN for nnx.DiffState (which has no "remaining" notion)
_GEN_DIFF = nnx.All(
    nnx.Param, nnx.Not(nnx.PathContains("discr")), nnx.Not(nnx.PathContains("_vgg"))
)


class VQGanVAETrainer:
    """GAN training loop for the VQ-GAN VAE (reference trainers.py:117-415).

    NOTE: the jitted step DONATES the train state, which initially aliases
    the `vae` you pass in — after the first step the original module
    object's buffers are invalid. Use `trainer.vae_module()` (or the EMA
    variant) for the live model.
    """

    def __init__(
        self,
        vae: VQGanVAE,
        *,
        folder,
        num_train_steps: int,
        batch_size: int,
        image_size: int,
        lr: float = 3e-4,
        warmup_steps: int = 0,
        lr_decay_steps: Optional[int] = None,
        grad_accum_every: int = 1,
        max_grad_norm: Optional[float] = None,
        discr_max_grad_norm: Optional[float] = None,
        save_results_every: int = 100,
        save_model_every: int = 1000,
        results_folder: str = "./results",
        valid_frac: float = 0.05,
        random_split_seed: int = 42,
        use_ema: bool = True,
        ema_beta: float = 0.995,
        ema_update_after_step: int = 0,
        ema_update_every: int = 1,
        apply_grad_penalty_every: int = 4,
        mesh=None,
        shard_state: bool = False,
        shard_state_rules=None,
        seed: int = 0,
        clear_previous_results: Optional[bool] = None,
        dataset=None,
        metrics_file=None,
        auto_resume: bool = False,
        async_checkpoints: bool = False,
        max_checkpoints: Optional[int] = None,
        random_flip: bool = True,
    ):
        self.num_train_steps = num_train_steps
        self.batch_size = batch_size
        self.image_size = image_size
        self.async_checkpoints = async_checkpoints
        self.max_checkpoints = max_checkpoints
        self.grad_accum_every = grad_accum_every
        self.apply_grad_penalty_every = apply_grad_penalty_every
        self.save_results_every = save_results_every
        self.save_model_every = save_model_every
        self.use_ema = use_ema
        self.ema_kwargs = dict(
            beta=ema_beta,
            update_after_step=ema_update_after_step,
            update_every=ema_update_every,
        )

        self.mesh = default(mesh, lambda: create_mesh())
        self.has_discr = exists(vae.discr)

        # split: discriminator params / frozen vgg / generator params / rest
        self.graphdef, discr_params, vgg_params, gen_params, rest = nnx.split(
            vae, _DISCR, _VGG, _GEN, ...
        )

        self._lr_sched = lr_schedule(lr, warmup_steps, lr_decay_steps)
        self.gen_tx = _make_optimizer(self._lr_sched, max_grad_norm)
        self.discr_tx = _make_optimizer(self._lr_sched, discr_max_grad_norm)

        self.state = dict(
            gen_params=gen_params,
            discr_params=discr_params,
            vgg_params=vgg_params,
            rest=rest,
            gen_opt=self.gen_tx.init(gen_params),
            discr_opt=self.discr_tx.init(discr_params),
            ema=ema_init(gen_params) if use_ema else None,
            step=jnp.zeros((), jnp.int32),
            rng=jax.random.PRNGKey(seed),
        )
        self.state_shardings = _maybe_shard_state(self, shard_state, shard_state_rules)

        # dataset + split (reference trainers.py:187-214). `random_flip`
        # matches the reference's always-on RandomHorizontalFlip by default;
        # turn it off for datasets whose semantics flips would blur (measured
        # on the e2e shapes demo: flip ON cost ~8 dB of held-out recon PSNR
        # at equal steps — see BASELINE.md r5)
        ds = default(
            dataset, lambda: ImageDataset(folder, image_size, random_flip=random_flip)
        )
        self.ds, self.valid_ds = split_dataset(ds, valid_frac, random_split_seed)
        self.print(
            f"training with dataset of {len(self.ds)} samples and validating "
            f"with randomly splitted {len(self.valid_ds)} samples"
        )
        micro = batch_size
        self.dl_iter = cycle(DataLoader(self.ds, micro, shuffle=True, seed=seed))
        self.valid_dl_iter = cycle(
            DataLoader(self.valid_ds, micro, shuffle=True, seed=seed)
        )

        self.results_folder = Path(results_folder)
        if (
            self.results_folder.exists()
            and len(list(self.results_folder.glob("**/*"))) > 0
            and clear_previous_results
        ):
            rmtree(str(self.results_folder))
        self.results_folder.mkdir(parents=True, exist_ok=True)

        self.metrics = MetricsLogger(
            default(metrics_file, self.results_folder / "metrics.jsonl"),
            enabled=is_main_process(),
        )
        self.timer = StepTimer()

        self._train_step = self._build_train_step()

        # elastic recovery: pick up the latest checkpoint if present
        # (the reference cannot — its checkpoints drop the step counter,
        # trainers.py:253-273)
        # drain in-flight async saves BEFORE listing steps, or a just-saved
        # step is invisible (still a tmp dir) and resume silently goes stale
        if auto_resume:
            wait_for_saves()
        if auto_resume and latest_step(self.results_folder / "checkpoints") is not None:
            self.load()
            self.print(f"auto-resumed from step {self.steps}")

    # -- utilities -----------------------------------------------------------

    def print(self, msg):
        if is_main_process():
            print(msg)

    @property
    def steps(self) -> int:
        return int(self.state["step"])

    def vae_module(self, use_ema: bool = False) -> VQGanVAE:
        gen = self.state["ema"] if (use_ema and self.use_ema) else self.state["gen_params"]
        return nnx.merge(
            self.graphdef,
            self.state["discr_params"],
            self.state["vgg_params"],
            gen,
            self.state["rest"],
        )

    def save(self, path=None):
        # sharded state: every process calls in (Orbax coordinates multi-host
        # sharded saves; a rank gate would deadlock them). Replicated state:
        # arrays are process-local, so only rank 0 writes — concurrent
        # uncoordinated saves of the same step dir would race.
        if self.state_shardings is None and not is_main_process():
            return
        ckpt_dir = default(path, self.results_folder / "checkpoints")
        save_train_state(
            ckpt_dir,
            self.steps,
            {k: v for k, v in self.state.items()},
            async_save=self.async_checkpoints,
            keep=self.max_checkpoints,
        )

    def load(self, path=None, step: Optional[int] = None):
        wait_for_saves()  # an in-flight async save may be the latest step
        ckpt_dir = default(path, self.results_folder / "checkpoints")
        restored, s = load_train_state(
            ckpt_dir, step, target=self.state, shardings=self.state_shardings
        )
        self.state = restored
        self.state["step"] = jnp.asarray(s, jnp.int32)

    # -- the jitted step -------------------------------------------------------

    def _build_train_step(self):
        graphdef = self.graphdef
        gen_tx, discr_tx = self.gen_tx, self.discr_tx
        use_ema, ema_kwargs = self.use_ema, self.ema_kwargs
        lr_sched = self._lr_sched
        has_discr = self.has_discr
        gp_every = self.apply_grad_penalty_every
        accum = self.grad_accum_every
        jit_kwargs = _state_jit_kwargs(self)

        def gen_loss_fn(gen_params, discr_params, vgg_params, rest, img, key):
            model = nnx.merge(graphdef, discr_params, vgg_params, gen_params, rest)
            # update_stats=False: flax forbids Variable mutation inside
            # jax.grad; the EMA-VQ codebook update runs separately below
            return model(img, return_loss=True, train=True, rng=key, update_stats=False)

        def update_vq_stats(gen_params, discr_params, vgg_params, rest, img, key):
            # EMA-VQ codebook statistics: mutation outside the grad trace
            model = nnx.merge(graphdef, discr_params, vgg_params, gen_params, rest)
            model.update_quantizer_stats(img, rng=key)
            _, _, _, _, new_rest = nnx.split(model, _DISCR, _VGG, _GEN, ...)
            return new_rest

        def discr_loss_fn(discr_params, gen_params, vgg_params, rest, img, key, apply_gp):
            model = nnx.merge(graphdef, discr_params, vgg_params, gen_params, rest)

            def with_gp(_):
                return model(img, return_discr_loss=True, add_gradient_penalty=True,
                             train=False, rng=key)

            def without_gp(_):
                return model(img, return_discr_loss=True, add_gradient_penalty=False,
                             train=False, rng=key)

            return jax.lax.cond(apply_gp, with_gp, without_gp, None)

        @functools.partial(jax.jit, donate_argnums=(0,), **jit_kwargs)
        def train_step(state, gen_imgs, discr_imgs):
            # gen_imgs/discr_imgs: (accum, B, H, W, C)
            rng = state["rng"]
            step = state["step"]
            rng, *keys = jax.random.split(rng, 2 * accum + 1)
            gen_keys = jnp.stack(keys[:accum])
            discr_keys = jnp.stack(keys[accum:])

            # -- generator phase: scan over micro-batches, accumulate grads
            def gen_micro(carry, xs):
                g_acc, loss_acc, rest = carry
                img, key = xs
                loss, grads = jax.value_and_grad(gen_loss_fn)(
                    state["gen_params"], state["discr_params"], state["vgg_params"],
                    rest, img, key,
                )
                new_rest = update_vq_stats(
                    state["gen_params"], state["discr_params"], state["vgg_params"],
                    rest, img, key,
                )
                g_acc = jax.tree.map(jnp.add, g_acc, grads)
                return (g_acc, loss_acc + loss, new_rest), None

            zero_g = jax.tree.map(jnp.zeros_like, state["gen_params"])
            (g_sum, gen_loss_sum, rest), _ = jax.lax.scan(
                gen_micro, (zero_g, 0.0, state["rest"]), (gen_imgs, gen_keys)
            )
            g_avg = jax.tree.map(lambda g: g / accum, g_sum)
            updates, gen_opt = gen_tx.update(g_avg, state["gen_opt"], state["gen_params"])
            gen_params = optax.apply_updates(state["gen_params"], updates)

            logs = {
                "loss": gen_loss_sum / accum,
                "grad_norm": optax.global_norm(g_avg),
            }
            if callable(lr_sched):  # logged from inside the jit: a host-side
                logs["lr"] = lr_sched(step)  # schedule eval is a tunnel RPC

            # -- discriminator phase
            discr_params, discr_opt = state["discr_params"], state["discr_opt"]
            if has_discr:
                apply_gp = (step % gp_every) == 0

                def discr_micro(carry, xs):
                    g_acc, loss_acc = carry
                    img, key = xs
                    loss, grads = jax.value_and_grad(discr_loss_fn)(
                        discr_params, gen_params, state["vgg_params"], rest, img, key, apply_gp
                    )
                    return (jax.tree.map(jnp.add, g_acc, grads), loss_acc + loss), None

                zero_d = jax.tree.map(jnp.zeros_like, discr_params)
                (d_sum, d_loss_sum), _ = jax.lax.scan(
                    discr_micro, (zero_d, 0.0), (discr_imgs, discr_keys)
                )
                d_avg = jax.tree.map(lambda g: g / accum, d_sum)
                d_updates, discr_opt = discr_tx.update(d_avg, discr_opt, discr_params)
                discr_params = optax.apply_updates(discr_params, d_updates)
                logs["discr_loss"] = d_loss_sum / accum
                logs["discr_grad_norm"] = optax.global_norm(d_avg)

            # -- EMA of the generator (reference trainers.py:358-359)
            ema = state["ema"]
            if use_ema:
                ema = ema_update(ema, gen_params, step, **ema_kwargs)

            new_state = dict(
                gen_params=gen_params,
                discr_params=discr_params,
                vgg_params=state["vgg_params"],
                rest=rest,
                gen_opt=gen_opt,
                discr_opt=discr_opt,
                ema=ema,
                step=step + 1,
                rng=rng,
            )
            return new_state, logs

        return train_step

    # -- host loop -------------------------------------------------------------

    def _next_accum_batch(self, it):
        return np.stack([next(it) for _ in range(self.grad_accum_every)])

    def train_step(self):
        steps = self.steps
        gen_imgs = self._next_accum_batch(self.dl_iter)
        discr_imgs = (
            self._next_accum_batch(self.dl_iter) if self.has_discr else gen_imgs
        )
        with self.mesh:
            self.state, logs = self._train_step(
                self.state,
                _put_microbatched(gen_imgs, self.mesh),
                _put_microbatched(discr_imgs, self.mesh),
            )
        # ONE device->host fetch for the whole log dict: per-scalar
        # float() would pay a ~30 ms tunnel RPC per entry per step
        logs = {k: float(v) for k, v in jax.device_get(logs).items()}
        self.timer.tick()
        sps = self.timer.steps_per_sec
        if sps is not None:
            logs["steps_per_sec"] = round(sps, 3)
        self.metrics.log(steps, **logs)

        if self.has_discr:
            self.print(
                f"{steps}: vae loss: {logs['loss']} - discr loss: {logs.get('discr_loss')}"
            )
        else:
            self.print(f"{steps}: vae loss: {logs['loss']}")

        # periodic eval reconstruction grids (reference trainers.py:361-389);
        # the recon forward runs through one cached jit (params as arguments)
        # rather than an eager module call per eval
        if steps % self.save_results_every == 0:
            evals = [(False, str(steps))]
            if self.use_ema:
                evals.insert(0, (True, f"{steps}.ema"))
            valid_data = jnp.asarray(next(self.valid_dl_iter))
            for use_ema, filename in evals:
                gen = (
                    self.state["ema"]
                    if (use_ema and self.use_ema)
                    else self.state["gen_params"]
                )
                recons = _eval_recon_jit(
                    self.graphdef,
                    (
                        self.state["discr_params"],
                        self.state["vgg_params"],
                        gen,
                        self.state["rest"],
                    ),
                    valid_data,
                )
                stacked = np.stack(
                    [np.asarray(valid_data), np.asarray(recons)], axis=1
                ).reshape(-1, *valid_data.shape[1:])
                grid = make_grid(stacked, nrow=2)
                save_image(grid, self.results_folder / f"{filename}.png")
                logs["reconstructions"] = grid
            self.print(f"{steps}: saving to {self.results_folder}")

        # periodic checkpoints (reference trainers.py:391-403)
        if steps % self.save_model_every == 0:
            self.save()
            vae = self.vae_module(use_ema=False)
            vae.save(self.results_folder / f"vae.{steps}.pt")
            if self.use_ema:
                ema_vae = self.vae_module(use_ema=True)
                ema_vae.save(self.results_folder / f"vae.{steps}.ema.pt")
            self.print(f"{steps}: saving model to {self.results_folder}")

        return logs

    def train(self, log_fn: Callable = lambda *a, **k: None):
        with PreemptionGuard() as guard:
            while self.steps < self.num_train_steps and not guard.requested:
                logs = self.train_step()
                log_fn(logs)
            if guard.requested:
                # SIGTERM grace window (preemptible TPU pools): checkpoint
                # the exact state so auto_resume continues from this step
                self.print(
                    f"preemption signal: checkpointing step {self.steps} and exiting"
                )
                self.save()
        wait_for_saves()  # drain any in-flight async checkpoint writes
        self.print("training complete")


# ---------------------------------------------------------------------------
# MaskGit trainer (not present in the reference — README.md:235 Todo)
# ---------------------------------------------------------------------------


class MaskGitTrainer:
    """Trainer for base or super-res MaskGit: masked-token CE (+ critic BCE),
    single optax optimizer over the transformer (+ critic) params, EMA,
    grad-accum via scan, Orbax checkpoints, data-parallel over the mesh.

    The VAE and T5 encoder are frozen (their params live in the non-trainable
    partition of the split, mirroring the reference's frozen-encoder setup,
    muse_maskgit_pytorch.py:445,641-642,690-692).

    NOTE: the jitted step DONATES the train state, and that state initially
    aliases the module you pass in — after the first step the original
    module object's buffers are invalid ("Array has been deleted"). Use
    `trainer.maskgit_module()` for the live (or EMA) model.
    """

    def __init__(
        self,
        maskgit: MaskGit,
        *,
        num_train_steps: int,
        batch_size: int,
        lr: float = 1e-4,
        warmup_steps: int = 0,
        lr_decay_steps: Optional[int] = None,
        weight_decay: float = 0.0,
        grad_accum_every: int = 1,
        max_grad_norm: Optional[float] = None,
        save_model_every: int = 1000,
        results_folder: str = "./results-maskgit",
        use_ema: bool = True,
        ema_beta: float = 0.995,
        ema_update_after_step: int = 0,
        ema_update_every: int = 1,
        mesh=None,
        shard_state: bool = False,
        shard_state_rules=None,
        seed: int = 0,
        attn_impl: str = "auto",
        metrics_file=None,
        auto_resume: bool = False,
        async_checkpoints: bool = False,
        max_checkpoints: Optional[int] = None,
        save_results_every: Optional[int] = None,
        sample_texts: Optional[Sequence[str]] = None,
        sample_kwargs: Optional[dict] = None,
    ):
        self.num_train_steps = num_train_steps
        self.batch_size = batch_size
        self.grad_accum_every = grad_accum_every
        self.async_checkpoints = async_checkpoints
        self.max_checkpoints = max_checkpoints
        self.save_results_every = save_results_every
        if exists(save_results_every):
            assert sample_texts, "save_results_every needs sample_texts to render"
        self.sample_texts = sample_texts
        self.sample_kwargs = dict(sample_kwargs or {})
        self.save_model_every = save_model_every
        self.use_ema = use_ema
        self.ema_kwargs = dict(
            beta=ema_beta,
            update_after_step=ema_update_after_step,
            update_every=ema_update_every,
        )
        self.mesh = default(mesh, lambda: create_mesh())
        self.attn_impl = attn_impl

        # trainable = transformer + critic params; frozen = the vae copies
        trainable_filter = nnx.All(
            nnx.Param,
            nnx.Not(nnx.PathContains("vae")),
            nnx.Not(nnx.PathContains("cond_vae")),
        )
        self.graphdef, params, frozen = nnx.split(maskgit, trainable_filter, ...)

        self._lr_sched = lr_schedule(lr, warmup_steps, lr_decay_steps)
        if weight_decay > 0:
            opt = optax.adamw(self._lr_sched, weight_decay=weight_decay)
        else:
            opt = optax.adam(self._lr_sched)
        chain = []
        if exists(max_grad_norm):
            chain.append(optax.clip_by_global_norm(max_grad_norm))
        chain.append(opt)
        self.tx = optax.chain(*chain)

        self.state = dict(
            params=params,
            frozen=frozen,
            opt=self.tx.init(params),
            ema=ema_init(params) if use_ema else None,
            step=jnp.zeros((), jnp.int32),
            rng=jax.random.PRNGKey(seed),
        )
        self.state_shardings = _maybe_shard_state(self, shard_state, shard_state_rules)

        self.results_folder = Path(results_folder)
        self.results_folder.mkdir(parents=True, exist_ok=True)

        self.metrics = MetricsLogger(
            default(metrics_file, self.results_folder / "metrics.jsonl"),
            enabled=is_main_process(),
        )
        self.timer = StepTimer()

        self._train_step = self._build_train_step()

        # drain in-flight async saves BEFORE listing steps, or a just-saved
        # step is invisible (still a tmp dir) and resume silently goes stale
        if auto_resume:
            wait_for_saves()
        if auto_resume and latest_step(self.results_folder / "checkpoints") is not None:
            self.load()
            self.print(f"auto-resumed from step {self.steps}")

    @property
    def steps(self) -> int:
        return int(self.state["step"])

    def print(self, msg):
        if is_main_process():
            print(msg)

    def maskgit_module(self, use_ema: bool = False) -> MaskGit:
        params = self.state["ema"] if (use_ema and self.use_ema) else self.state["params"]
        return nnx.merge(self.graphdef, params, self.state["frozen"])

    def save(self, path=None):
        # sharded state: every process calls in (Orbax coordinates multi-host
        # sharded saves; a rank gate would deadlock them). Replicated state:
        # arrays are process-local, so only rank 0 writes — concurrent
        # uncoordinated saves of the same step dir would race.
        if self.state_shardings is None and not is_main_process():
            return
        ckpt_dir = default(path, self.results_folder / "checkpoints")
        save_train_state(
            ckpt_dir,
            self.steps,
            self.state,
            async_save=self.async_checkpoints,
            keep=self.max_checkpoints,
        )

    def load(self, path=None, step=None):
        wait_for_saves()  # an in-flight async save may be the latest step
        ckpt_dir = default(path, self.results_folder / "checkpoints")
        restored, s = load_train_state(
            ckpt_dir, step, target=self.state, shardings=self.state_shardings
        )
        self.state = restored
        self.state["step"] = jnp.asarray(s, jnp.int32)

    def save_sample_results(self, step: Optional[int] = None):
        """Render a generation grid from `sample_texts` (EMA model when
        available) into the results folder — the MaskGit-stage analogue of
        the reference VAE trainer's periodic recon grids (trainers.py:361-389;
        the reference never shipped a MaskGit trainer, README.md:235 Todo).

        Runs the (jitted) decode on every process — Orbax-style, a rank gate
        around a computation over potentially mesh-sharded params would
        deadlock multi-host — and rank-gates only the file write inside
        `save_image` via `is_main_process`.
        """
        step = default(step, self.steps)
        model = self.maskgit_module(use_ema=self.use_ema)
        rng = jax.random.fold_in(jax.random.PRNGKey(0x5A), step)
        with self.mesh:
            images = model.generate(
                list(self.sample_texts), rng=rng, **self.sample_kwargs
            )
            # quantize on device: the tunneled device->host path is slow and
            # high-variance, so fetch 1 byte/px, not 4 (CLAUDE.md)
            images_u8 = (jnp.clip(images, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)
        if is_main_process():
            n = len(self.sample_texts)
            grid = make_grid(np.asarray(images_u8).astype(np.float32) / 255.0, nrow=min(n, 4))
            save_image(grid, self.results_folder / f"maskgit.{step}.png")
        self.print(f"{step}: saving samples to {self.results_folder}")

    def _build_train_step(self):
        graphdef = self.graphdef
        tx = self.tx
        accum = self.grad_accum_every
        lr_sched = self._lr_sched
        use_ema, ema_kwargs = self.use_ema, self.ema_kwargs
        attn_impl = self.attn_impl
        jit_kwargs = _state_jit_kwargs(self)

        def loss_fn(params, frozen, images, text_embeds, text_mask, cond, key):
            model: MaskGit = nnx.merge(graphdef, params, frozen)
            return model(
                images,
                rng=key,
                text_embeds=text_embeds,
                text_mask=text_mask,
                cond_token_ids=cond,
                attn_impl=attn_impl,
            )

        @functools.partial(jax.jit, donate_argnums=(0,), **jit_kwargs)
        def train_step(state, images, text_embeds, text_mask, cond):
            # leading dim = accum micro-batches; cond (super-res conditioning
            # token ids) is None for base-stage training — a None xs entry
            # passes through the scan untouched
            rng, step = state["rng"], state["step"]
            rng, *keys = jax.random.split(rng, accum + 1)
            keys = jnp.stack(keys)

            def micro(carry, xs):
                g_acc, loss_acc = carry
                img, te, tm, cnd, key = xs
                loss, grads = jax.value_and_grad(loss_fn)(
                    state["params"], state["frozen"], img, te, tm, cnd, key
                )
                return (jax.tree.map(jnp.add, g_acc, grads), loss_acc + loss), None

            zero = jax.tree.map(jnp.zeros_like, state["params"])
            (g_sum, loss_sum), _ = jax.lax.scan(
                micro, (zero, 0.0), (images, text_embeds, text_mask, cond, keys)
            )
            g_avg = jax.tree.map(lambda g: g / accum, g_sum)
            updates, opt = tx.update(g_avg, state["opt"], state["params"])
            params = optax.apply_updates(state["params"], updates)

            ema = state["ema"]
            if use_ema:
                ema = ema_update(ema, params, step, **ema_kwargs)

            new_state = dict(
                params=params,
                frozen=state["frozen"],
                opt=opt,
                ema=ema,
                step=step + 1,
                rng=rng,
            )
            logs = {
                "loss": loss_sum / accum,
                "grad_norm": optax.global_norm(g_avg),
            }
            if callable(lr_sched):  # logged from inside the jit: a host-side
                logs["lr"] = lr_sched(step)  # schedule eval is a tunnel RPC
            return new_state, logs

        return train_step

    def train_step_arrays(self, images, text_embeds, text_mask, cond_token_ids=None):
        """One step. Arrays shaped (accum, B, ...). `cond_token_ids`
        (accum, B, n) conditions the cross-attention context — super-res
        ids-path training with pre-tokenized low-res grids (raw-image
        super-res training needs nothing here: the model auto-resizes,
        B3 fix)."""
        with self.mesh:
            self.state, logs = self._train_step(
                self.state,
                _put_microbatched(images, self.mesh),
                _put_microbatched(text_embeds, self.mesh),
                _put_microbatched(text_mask, self.mesh),
                (
                    _put_microbatched(cond_token_ids, self.mesh)
                    if cond_token_ids is not None
                    else None
                ),
            )
        # ONE device->host fetch for the whole log dict: per-scalar
        # float() would pay a ~30 ms tunnel RPC per entry per step
        logs = {k: float(v) for k, v in jax.device_get(logs).items()}
        self.timer.tick()
        sps = self.timer.steps_per_sec
        if sps is not None:
            logs["steps_per_sec"] = round(sps, 3)
        self.metrics.log(self.steps - 1, **logs)
        return logs

    def _encoded_accum_batches(self, data_iter):
        """Yield (images, text_embeds, text_mask) stacked accumulation
        batches, T5-encoding and length-padding on the host."""
        from muse_maskgit_pytorch_tpu.models.t5 import t5_encode_text_with_mask

        t5_name = self.maskgit_module().transformer.t5_name
        while True:
            imgs, tes, tms = [], [], []
            max_len = 0
            for _ in range(self.grad_accum_every):
                images, texts = next(data_iter)
                te, tm = t5_encode_text_with_mask(texts, name=t5_name)
                imgs.append(np.asarray(images))
                tes.append(np.asarray(te))
                tms.append(np.asarray(tm))
                max_len = max(max_len, te.shape[1])
            # pad text lengths across micro-batches for stacking
            for i in range(len(tes)):
                pad = max_len - tes[i].shape[1]
                if pad:
                    tes[i] = np.pad(tes[i], ((0, 0), (0, pad), (0, 0)))
                    tms[i] = np.pad(tms[i], ((0, 0), (0, pad)))
            yield np.stack(imgs), np.stack(tes), np.stack(tms)

    def train(self, data_iter, log_fn: Callable = lambda *a, **k: None, prefetch: int = 2):
        """data_iter yields (images (B,H,W,C) float [0,1], texts: list[str])
        per micro-batch. `prefetch` > 0 moves the host-side batch prep (incl.
        the frozen-T5 text encoding) to a background thread so it overlaps
        the device step; 0 restores the strictly-alternating behavior."""
        batches = prefetch_iterator(self._encoded_accum_batches(data_iter), prefetch)
        with PreemptionGuard() as guard:
            while self.steps < self.num_train_steps and not guard.requested:
                images, tes, tms = next(batches)
                logs = self.train_step_arrays(images, tes, tms)
                self.print(f"{self.steps - 1}: maskgit loss: {logs['loss']}")
                if (self.steps - 1) % self.save_model_every == 0:
                    self.save()
                if (
                    exists(self.save_results_every)
                    and (self.steps - 1) % self.save_results_every == 0
                ):
                    self.save_sample_results(self.steps - 1)
                log_fn(logs)
            if guard.requested:
                self.print(
                    f"preemption signal: checkpointing step {self.steps} and exiting"
                )
                self.save()
        wait_for_saves()  # drain any in-flight async checkpoint writes
        self.print("training complete")

    def train_from_shards(
        self,
        token_paths,
        *,
        use_captions: bool = False,
        cond_token_len: Optional[int] = None,
        loader_seed: int = 0,
        num_threads: int = 2,
        prefetch: int = 2,
        log_fn: Callable = lambda *a, **k: None,
        process_index: int = 0,
        process_count: int = 1,
    ):
        """Large-scale ids-path training straight from native token shards
        (`examples/tokenize_dataset.py` output; `native/shard_loader.cpp`).

        Text conditioning joins the `<shard>.captions` sidecars when
        `use_captions=True` (host T5 encoding overlapped with the device step
        via `prefetch`); otherwise training is unconditional — null text, the
        pure-CFG-dropout regime.

        The data stream resumes EXACTLY with `auto_resume`: every step
        consumes `grad_accum_every` loader batches, so the resume token is
        `steps * grad_accum_every` — no loader state file needed; the C++
        loader replays the shuffle stream from the seed (bit-identical order
        with num_threads=1, at-least-once with more).

        `cond_token_len`: super-res training from PAIRED shards — each row
        carries the target ids followed by its low-res conditioning ids
        (`examples/tokenize_dataset.py --cond-image-size` emits this
        layout); the trailing `cond_token_len` ids of every row feed the
        cross-attention context. One loader, one shuffle stream — target
        and conditioning can never fall out of alignment.

        Aspect-bucketed rectangular training: shards carrying v2 grid
        metadata (`write_shard(..., grid=(fh, fw))`;
        `examples/tokenize_dataset.py --image-size HxW`) train their ids as
        (b, fh, fw) grids, so positions resize to each bucket's aspect ratio
        exactly as rectangular sampling does. A mixed `token_paths` list is
        grouped by (seq_len, grid) into buckets — one loader and one
        compiled step shape per bucket — and a deterministic seeded schedule
        picks the bucket for each optimizer step (weighted by bucket size;
        every micro-batch of a step shares the bucket's static shape).
        Resume replays the schedule's first `steps` draws to recover every
        bucket's skip count, so mid-epoch resume stays exact.
        """
        from muse_maskgit_pytorch_tpu.models.t5 import t5_encode_text_with_mask
        from muse_maskgit_pytorch_tpu.training.shard_loader import (
            ShardLoader,
            read_shard_header,
        )

        transformer = self.maskgit_module().transformer
        t5_name, text_dim = transformer.t5_name, transformer.text_embed_dim

        # ---- bucket shards by static shape (v2 grid metadata) ------------
        by_shape: dict = {}
        group_seqs: dict = {}
        for p in [str(q) for q in token_paths]:
            hdr = read_shard_header(p)
            key = (hdr["seq_len"], hdr["grid"])
            by_shape.setdefault(key, []).append(p)
            group_seqs[key] = group_seqs.get(key, 0) + hdr["num_seqs"]
        groups = sorted(by_shape.items(), key=lambda kv: (kv[0][0], kv[0][1] or (0, 0)))

        # one bucket draw per optimizer step; replaying the first `steps`
        # draws recovers each bucket's resume skip. Weights use GLOBAL
        # sequence counts (identical on every host), so all processes agree
        # on the schedule while each opens only its shard slice.
        sched_rng = np.random.default_rng(loader_seed)
        weights = np.array([group_seqs[k] for k, _ in groups], np.float64)
        weights /= weights.sum()

        def draw():
            return 0 if len(groups) == 1 else int(sched_rng.choice(len(groups), p=weights))

        skips = [0] * len(groups)
        for _ in range(self.steps):
            skips[draw()] += self.grad_accum_every

        loaders = [
            ShardLoader(
                paths,
                self.batch_size,
                seed=loader_seed + 1000003 * gi,  # independent shuffle streams
                num_threads=num_threads,
                drop_last=True,
                process_index=process_index,
                process_count=process_count,
                skip_batches=skips[gi],
            )
            for gi, (_, paths) in enumerate(groups)
        ]
        # a bucket smaller than one batch can never fill its static shape:
        # the native loader's drop_last wraps the epoch and still returns a
        # PARTIAL batch (take = num_seqs < batch_size), which would surprise
        # the jitted step with a new shape mid-run (recompile at best, a
        # divisibility crash under data-axis sharding at worst). Fail loudly
        # at open time instead — merge tiny aspect buckets (fewer
        # --auto-bucket bins) or lower batch_size.
        for gi, ld in enumerate(loaders):
            if ld.num_seqs < self.batch_size:
                key = groups[gi][0]
                raise ValueError(
                    f"shard bucket {key} holds only {ld.num_seqs} sequences "
                    f"on this process — fewer than batch_size="
                    f"{self.batch_size}, so it cannot yield a full "
                    "static-shape batch. Merge small aspect buckets (reduce "
                    "--auto-bucket bins) or lower batch_size."
                )
        cap_iters = [ld.captioned() if use_captions else None for ld in loaders]

        def pull(gi):
            """One micro-batch from bucket gi: (tokens, cond, te, tm)."""
            loader = loaders[gi]
            if use_captions:
                tokens, texts = next(cap_iters[gi])
                te, tm = t5_encode_text_with_mask(texts, name=t5_name)
                te, tm = np.asarray(te), np.asarray(tm)
            else:
                tokens = loader.next_batch()
                te = np.zeros((tokens.shape[0], 1, text_dim), np.float32)
                tm = np.zeros((tokens.shape[0], 1), bool)
            tokens = tokens.astype(np.int32)
            cond = None
            if cond_token_len:
                # paired rows: [target ids ++ cond ids]
                cond = tokens[:, -cond_token_len:]
                tokens = tokens[:, :-cond_token_len]
            if loader.grid is not None:
                fh, fw = loader.grid
                assert fh * fw == tokens.shape[1], (
                    f"shard grid {loader.grid} does not tile the target ids "
                    f"({tokens.shape[1]} after cond split)"
                )
                tokens = tokens.reshape(tokens.shape[0], fh, fw)
            return tokens, cond, te, tm

        def accum_batches():
            while True:
                gi = draw()  # whole step in ONE bucket: one static shape
                toks, conds, tes, tms = [], [], [], []
                max_len = 1
                for _ in range(self.grad_accum_every):
                    tokens, cond, te, tm = pull(gi)
                    if cond is not None:
                        conds.append(cond)
                    toks.append(tokens)
                    tes.append(te)
                    tms.append(tm)
                    max_len = max(max_len, te.shape[1])
                for i in range(len(tes)):  # pad text lengths for stacking
                    pad = max_len - tes[i].shape[1]
                    if pad:
                        tes[i] = np.pad(tes[i], ((0, 0), (0, pad), (0, 0)))
                        tms[i] = np.pad(tms[i], ((0, 0), (0, pad)))
                yield (
                    np.stack(toks),
                    np.stack(conds) if cond_token_len else None,
                    np.stack(tes),
                    np.stack(tms),
                )

        batches = prefetch_iterator(accum_batches(), prefetch)
        try:
            with PreemptionGuard() as guard:
                while self.steps < self.num_train_steps and not guard.requested:
                    tokens, conds, tes, tms = next(batches)
                    logs = self.train_step_arrays(tokens, tes, tms, cond_token_ids=conds)
                    self.print(f"{self.steps - 1}: maskgit loss: {logs['loss']}")
                    if (self.steps - 1) % self.save_model_every == 0:
                        self.save()
                    if (
                        exists(self.save_results_every)
                        and (self.steps - 1) % self.save_results_every == 0
                    ):
                        self.save_sample_results(self.steps - 1)
                    log_fn(logs)
                if guard.requested:
                    # the data stream resumes exactly too: the resume token
                    # is steps * grad_accum_every (see docstring)
                    self.print(
                        f"preemption signal: checkpointing step {self.steps} "
                        "and exiting"
                    )
                    self.save()
        finally:
            batches.close()  # joins the prefetch thread BEFORE the native
            for loader in loaders:  # handles are freed (use-after-free otherwise)
                loader.close()
        wait_for_saves()  # drain any in-flight async checkpoint writes
        self.print("training complete")
