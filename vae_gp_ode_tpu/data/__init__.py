from vae_gp_ode_tpu.data.mnist import (  # noqa: F401
    load_data, load_mnist_data, load_rotating_mnist_data,
    create_rotating_dataset, rot_start, Loader, MNIST_MEAN, MNIST_STD,
)
