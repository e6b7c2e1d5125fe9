# Tunables — same envelope the reference exposes
# (reference: tf/variables.tf:204-236 memory/replica knobs).

variable "kubeconfig" {
  type    = string
  default = "~/.kube/config"
}

variable "namespace" {
  type    = string
  default = "walden-spark"
}

# MinIO (reference: tf/variables.tf:71-80 — 4 x 512M erasure-coded)
variable "minio_replicas" {
  type    = number
  default = 4
}

variable "minio_memory" {
  type    = string
  default = "512Mi"
}

variable "minio_root_user" {
  type    = string
  default = "walden"
}

variable "minio_root_password" {
  type      = string
  sensitive = true
}

# Engine (replaces reference coordinator+worker memory envelope,
# tf/variables.tf:209-236: 3Gi pod / 2G heap / 1GB query memory)
variable "engine_image" {
  type    = string
  default = "apache/spark:4.0.0-python3"
}

variable "engine_executor_cores" {
  type    = number
  default = 4
}

variable "engine_memory" {
  type    = string
  default = "3Gi"
}

variable "warehouse_bucket" {
  type    = string
  default = "demobucket" # reference: tf/nessie-values.yaml:8-13
}

variable "engine_extra_conf" {
  description = "Extra spark conf key/values (the trino-catalog-extra analog, reference: README.md:399-413)"
  type        = map(string)
  default     = {}
}

# BI tier (reference: tf/superset/superset.tf + variables.tf superset_*)
variable "enable_superset" {
  type    = bool
  default = true
}

variable "superset_postgres_password" {
  type      = string
  sensitive = true
  default   = "superset"
}

variable "superset_secret_key" {
  type      = string
  sensitive = true
  default   = "change-me-in-prod"
}
