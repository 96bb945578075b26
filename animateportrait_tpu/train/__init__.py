"""Training: Module2 GAN trainer, Module1 landmark trainers, schedules."""
