"""Training CLI.

Flag-for-flag equivalent of the reference's torchmd-train entry point
(torchmdnet/scripts/train.py:22-123): ~80 flags, YAML config merge (CLI
overrides YAML), resolved config persisted to log_dir/input.yaml, then
data -> priors -> model -> trainer.fit -> reload best -> test.

TPU-specific flags replace the GPU ones: --ngpus/--num-nodes become
--ndevices (-1 = all local devices) since device-parallelism is a mesh, not
processes.
"""

import argparse
import logging
import os
import sys

from torchmdnet_tpu.models.output_heads import head_class_mapping
from torchmdnet_tpu.ops.activations import act_fn_mapping
from torchmdnet_tpu.ops.rbf import rbf_class_mapping
from torchmdnet_tpu.utils import LoadFromCheckpoint, LoadFromFile, number, save_argparse

MODEL_CHOICES = ["graph-network", "transformer", "equivariant-transformer", "tensornet"]
PRIOR_CHOICES = ["Atomref", "D2", "ZBL", "Coulomb"]


def str2bool(value):
    """Proper boolean flag parsing for the TPU-only flags.

    The reference's flags use argparse ``type=bool`` (any non-empty string,
    including "False", parses truthy — scripts/train.py:37-105); those are
    kept verbatim for CLI compatibility.  New flags introduced by this
    framework have no compatibility constraint, so they parse correctly:
    '--fused-attention False' means False.
    """
    if isinstance(value, bool):
        return value
    v = str(value).strip().lower()
    if v in ("1", "true", "t", "yes", "y", "on"):
        return True
    if v in ("0", "false", "f", "no", "n", "off", ""):
        return False
    raise argparse.ArgumentTypeError(f"expected a boolean, got {value!r}")


def get_args(argv=None):
    # fmt: off
    parser = argparse.ArgumentParser(description="Training")
    parser.add_argument('--load-model', action=LoadFromCheckpoint, help='Restart training using a model checkpoint')  # keep first
    parser.add_argument('--conf', '-c', type=open, action=LoadFromFile, help='Configuration yaml file')  # keep second
    parser.add_argument('--num-epochs', default=300, type=int, help='number of epochs')
    parser.add_argument('--batch-size', default=32, type=int, help='batch size')
    parser.add_argument('--inference-batch-size', default=None, type=int, help='Batchsize for validation and tests.')
    parser.add_argument('--lr', default=1e-4, type=float, help='learning rate')
    parser.add_argument('--lr-patience', type=int, default=10, help='Patience for lr-schedule. Patience per eval-interval of validation')
    parser.add_argument('--lr-metric', type=str, default='val_total_mse_loss', choices=['train_total_mse_loss', 'val_total_mse_loss'], help='Metric to monitor when deciding whether to reduce learning rate')
    parser.add_argument('--lr-min', type=float, default=1e-6, help='Minimum learning rate before early stop')
    parser.add_argument('--lr-factor', type=float, default=0.8, help='Factor by which to multiply the learning rate when the metric stops improving')
    parser.add_argument('--lr-warmup-steps', type=int, default=0, help='How many steps to warm-up over. Defaults to 0 for no warm-up')
    parser.add_argument('--early-stopping-patience', type=int, default=30, help='Stop training after this many epochs without improvement')
    parser.add_argument('--reset-trainer', type=bool, default=False, help='Reset training metrics (e.g. early stopping, lr) when loading a model checkpoint')
    parser.add_argument('--auto-resume', type=str2bool, default=False, help='Resume from the newest checkpoint in log-dir when no --load-model is given (elastic restart after preemption/crash)')
    parser.add_argument('--weight-decay', type=float, default=0.0, help='Weight decay strength')
    parser.add_argument('--ema-alpha-y', type=float, default=1.0, help='The amount of influence of new losses on the exponential moving average of y')
    parser.add_argument('--ema-alpha-neg-dy', type=float, default=1.0, help='The amount of influence of new losses on the exponential moving average of dy')
    parser.add_argument('--ndevices', type=int, default=-1, help='Number of TPU devices for data parallelism, -1 = use all available')
    parser.add_argument('--num-nodes', type=int, default=1, help='Number of hosts; rendezvous via MASTER_ADDR/MASTER_PORT/NODE_RANK env vars like the reference (jax.distributed.initialize, parallel/distributed.py)')
    parser.add_argument('--precision', type=int, default=32, choices=[16, 32, 64], help='Floating point precision (16 = bfloat16 compute)')
    parser.add_argument('--log-dir', '-l', default='/tmp/logs', help='log file')
    parser.add_argument('--splits', default=None, help='Npz with splits idx_train, idx_val, idx_test')
    parser.add_argument('--train-size', type=number, default=None, help='Percentage/number of samples in training set (None to use all remaining samples)')
    parser.add_argument('--val-size', type=number, default=0.05, help='Percentage/number of samples in validation set (None to use all remaining samples)')
    parser.add_argument('--test-size', type=number, default=0.1, help='Percentage/number of samples in test set (None to use all remaining samples)')
    parser.add_argument('--test-interval', type=int, default=-1, help='Test interval, one test per n epochs (default: 10)')
    parser.add_argument('--save-interval', type=int, default=10, help='Save interval, one save per n epochs (default: 10)')
    parser.add_argument('--seed', type=int, default=1, help='random seed (default: 1)')
    parser.add_argument('--num-workers', type=int, default=4, help='Number of workers for data prefetch')
    parser.add_argument('--redirect', type=bool, default=False, help='Redirect stdout and stderr to log_dir/log')
    parser.add_argument('--gradient-clipping', type=float, default=0.0, help='Gradient clipping norm')

    # dataset specific
    parser.add_argument('--dataset', default=None, type=str, help='Name of the dataset')
    parser.add_argument('--dataset-root', default='~/data', type=str, help='Data storage directory (not used if dataset is "CG")')
    parser.add_argument('--dataset-arg', default=None, help='Additional dataset arguments, e.g. target property for QM9 or molecule for MD17. JSON format.')
    parser.add_argument('--coord-files', default=None, type=str, help='Custom coordinate files glob')
    parser.add_argument('--embed-files', default=None, type=str, help='Custom embedding files glob')
    parser.add_argument('--energy-files', default=None, type=str, help='Custom energy files glob')
    parser.add_argument('--force-files', default=None, type=str, help='Custom force files glob')
    parser.add_argument('--y-weight', default=1.0, type=float, help='Weighting factor for y label in the loss function')
    parser.add_argument('--neg-dy-weight', default=1.0, type=float, help='Weighting factor for neg_dy label in the loss function')

    # model architecture
    parser.add_argument('--model', type=str, default='graph-network', choices=MODEL_CHOICES, help='Which model to train')
    parser.add_argument('--output-model', type=str, default='Scalar', choices=list(head_class_mapping.keys()), help='The type of output model')
    parser.add_argument('--prior-model', type=str, default=None, choices=PRIOR_CHOICES, help='Which prior model to use')

    # architectural args
    parser.add_argument('--charge', type=bool, default=False, help='Model needs a total charge')
    parser.add_argument('--spin', type=bool, default=False, help='Model needs a spin state')
    parser.add_argument('--embedding-dimension', type=int, default=256, help='Embedding dimension')
    parser.add_argument('--num-layers', type=int, default=6, help='Number of interaction layers in the model')
    parser.add_argument('--num-rbf', type=int, default=64, help='Number of radial basis functions in model')
    parser.add_argument('--activation', type=str, default='silu', choices=list(act_fn_mapping.keys()), help='Activation function')
    parser.add_argument('--rbf-type', type=str, default='expnorm', choices=list(rbf_class_mapping.keys()), help='Type of distance expansion')
    parser.add_argument('--trainable-rbf', type=bool, default=False, help='If distance expansion functions should be trainable')
    parser.add_argument('--neighbor-embedding', type=bool, default=False, help='If a neighbor embedding should be applied before interactions')
    parser.add_argument('--aggr', type=str, default='add', help="Aggregation operation for CFConv filter output. Must be one of 'add', 'mean', or 'max'")

    # Transformer specific
    parser.add_argument('--distance-influence', type=str, default='both', choices=['keys', 'values', 'both', 'none'], help='Where distance information is included inside the attention')
    parser.add_argument('--attn-activation', default='silu', choices=list(act_fn_mapping.keys()), help='Attention activation function')
    parser.add_argument('--num-heads', type=int, default=8, help='Number of attention heads')

    # TensorNet specific
    parser.add_argument('--equivariance-invariance-group', type=str, default='O(3)', help='Equivariance and invariance group of TensorNet')

    # other args
    parser.add_argument('--derivative', default=False, type=bool, help='If true, take the derivative of the prediction w.r.t coordinates')
    parser.add_argument('--cutoff-lower', type=float, default=0.0, help='Lower cutoff in model')
    parser.add_argument('--cutoff-upper', type=float, default=5.0, help='Upper cutoff in model')
    parser.add_argument('--atom-filter', type=int, default=-1, help='Only sum over atoms with Z > atom_filter')
    parser.add_argument('--max-z', type=int, default=100, help='Maximum atomic number that fits in the embedding matrix')
    parser.add_argument('--max-num-neighbors', type=int, default=32, help='Maximum number of neighbors to consider in the network')
    parser.add_argument('--remat', type=str2bool, default=False, help='Rematerialize each interaction layer in backward passes (O(1)-layer residual memory; needed for force training/evaluation on very large systems)')
    parser.add_argument('--bf16-messages', type=str2bool, default=False, help='Quantize message-passing gathers/products to bfloat16 with float32 accumulation (TPU HBM-traffic optimization; ~1.5x on TensorNet at protein sizes)')
    parser.add_argument('--fused-attention', type=str2bool, default=False, help='Route the equivariant-transformer or transformer edge phase through the fused Pallas kernels (requires bf16-messages; the trainer builds the gather plan and spatially sorts batches). Faster for energy AND force-loss training at protein scale (the second-order pass runs a fused VJP-of-VJP kernel — PERF.md r5: ET forces 175 vs 204 ms/step). Composes with --edge-partition (ring-assembled source tables)')
    parser.add_argument('--force-grad-mode', type=str, default='gradgrad', choices=['gradgrad', 'jvp'], help='Force-loss gradient formulation: nested reverse ("gradgrad", default) or forward-over-reverse ("jvp", -jvp_pos(grad_theta E; g)); mathematically identical (parity-tested), gradgrad measured faster on this platform')
    parser.add_argument('--fused-message', type=str2bool, default=False, help='Route the tensornet message phase (edge MLP + gather + weighted reduce) through the fused Pallas kernel (same requirements/behavior as --fused-attention)')
    parser.add_argument('--edge-partition', type=str2bool, default=False, help='Shard each batch\'s ATOM rows over the device mesh (ring schedule, O(N/D) per-device memory) instead of data parallelism over molecules — for batches of one huge molecule that exceed one chip\'s HBM. Energy and force losses both work; pair priors run ring-partitioned too')
    parser.add_argument('--edge-boundary-limit', type=int, default=65536, help='Upper limit on the ring boundary capacity sized from the first batch (edge-partition mode)')
    parser.add_argument('--plan-block-rows', type=int, default=0, help='Receiver rows per block of the fused-kernel gather plan (reduced automatically until it divides the padded atom count). 0 = auto (the batch0 probe uses 16, the measured best at protein density)')
    parser.add_argument('--plan-width', type=int, default=0, help='Unique-source capacity per gather-plan block (multiple of 128). 0 = auto: probed from the first batch at fit() setup (fused-kernel FLOPs scale linearly with this width). Must cover the densest block; overflow fails loudly via the per-batch capacity surveillance')
    parser.add_argument('--steps-per-dispatch', type=int, default=8, help='Optimizer steps fused into one device dispatch (lax.scan over stacked batches). Amortizes per-dispatch host overhead; numerics unchanged. Set 1 to dispatch each step individually.')
    parser.add_argument('--loader-buckets', type=int, default=1, help='Size buckets for batch padding (1 = single worst-case capacity). For heterogeneous datasets (e.g. SPICE) 3-4 buckets cut padded-atom waste several-fold at the cost of one compiled executable per bucket; batches become size-homogeneous (standard bucket-by-length trade-off).')
    parser.add_argument('--standardize', type=bool, default=False, help='If true, multiply prediction by dataset std and add mean')
    parser.add_argument('--reduce-op', type=str, default='sum', choices=['sum', 'add', 'mean'], help='Reduce operation to apply to atomic predictions')
    parser.add_argument('--wandb-use', default=False, type=bool, help='Defines if wandb is used or not')
    parser.add_argument('--wandb-name', default='training', type=str, help='Give a name to your wandb run')
    parser.add_argument('--wandb-project', default='training_', type=str, help='Define what wandb Project to log to')
    parser.add_argument('--wandb-resume-from-id', default=None, type=str, help='Resume a wandb run from a given run id.')
    parser.add_argument('--tensorboard-use', default=False, type=bool, help='Defines if tensor board is used or not')
    # fmt: on

    args = parser.parse_args(argv)

    if args.redirect:
        os.makedirs(args.log_dir, exist_ok=True)
        sys.stdout = open(os.path.join(args.log_dir, "log"), "w")
        sys.stderr = sys.stdout
        logging.getLogger().addHandler(logging.StreamHandler(sys.stdout))

    if args.inference_batch_size is None:
        args.inference_batch_size = args.batch_size

    os.makedirs(args.log_dir, exist_ok=True)
    if int(os.environ.get("NODE_RANK", "0")) == 0:
        save_argparse(args, os.path.join(args.log_dir, "input.yaml"), exclude=["conf"])
    return args


def main(argv=None):
    args = get_args(argv)
    hparams = vars(args)
    if isinstance(hparams.get("dataset_arg"), str):
        import json

        try:
            hparams["dataset_arg"] = json.loads(hparams["dataset_arg"])
        except json.JSONDecodeError:
            pass  # single string arg, e.g. a QM9 label

    import jax

    if hparams.get("precision") == 64:
        jax.config.update("jax_enable_x64", True)

    # multi-host rendezvous BEFORE any other jax call so jax.devices() spans
    # every node (reference DDP launch: scripts/train.py:176-180)
    from torchmdnet_tpu.parallel.distributed import barrier, initialize_distributed

    initialize_distributed(hparams.get("num_nodes", 1))

    import yaml

    from torchmdnet_tpu.data.module import DataModule
    from torchmdnet_tpu.models.potential import create_model, create_prior_models, load_model
    from torchmdnet_tpu.parallel.mesh import make_mesh
    from torchmdnet_tpu.train.trainer import Trainer

    # data
    data = DataModule(hparams)
    data.setup()

    prior_models = create_prior_models(hparams, data.dataset)
    hparams["prior_args"] = [p.get_init_args() for p in prior_models]

    # model
    if hparams.get("load_model"):
        model, _ = load_model(hparams["load_model"], args=hparams)
    else:
        model = create_model(hparams, prior_models, mean=data.mean, std=data.std)

    # persist hparams next to checkpoints for resume (utils.py:167-182 parity)
    if jax.process_index() == 0:
        with open(os.path.join(args.log_dir, "hparams.yaml"), "w") as f:
            yaml.safe_dump({k: v for k, v in hparams.items() if k != "conf"}, f)

    mesh = make_mesh(
        hparams.get("ndevices", -1),
        allow_single=bool(hparams.get("edge_partition")),
    )
    trainer = Trainer(model, hparams, mesh=mesh)
    state = trainer.fit(data, ckpt_path=hparams.get("load_model"))

    # reload the best checkpoint and run the test set (scripts/train.py:194-202).
    # All processes track the same best path; process 0 wrote it — barrier so
    # the file exists (shared filesystem) before anyone reads it.
    barrier("best-checkpoint")
    best = trainer.best_model_path
    if best is not None and os.path.exists(best):
        from flax import serialization

        from torchmdnet_tpu.train.checkpoints import load_checkpoint

        ckpt = load_checkpoint(best)
        params = serialization.from_state_dict(state.params, ckpt["params"])
    else:
        params = state.params
    trainer.test(data, params=params)


if __name__ == "__main__":
    main()
