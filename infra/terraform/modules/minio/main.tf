# Distributed MinIO — same topology as the reference's object store
# (reference: tf/minio/minio.tf:108-115 distributed StatefulSet,
# :91-106 pod anti-affinity one-per-node).

variable "namespace" { type = string }
variable "replicas" { type = number }
variable "memory" { type = string }
variable "root_user" { type = string }
variable "root_password" {
  type      = string
  sensitive = true
}

resource "kubernetes_secret" "minio" {
  metadata {
    name      = "minio-creds"
    namespace = var.namespace
  }
  data = {
    MINIO_ROOT_USER     = var.root_user
    MINIO_ROOT_PASSWORD = var.root_password
  }
}

resource "kubernetes_stateful_set" "minio" {
  metadata {
    name      = "minio"
    namespace = var.namespace
  }
  spec {
    service_name = "minio-headless"
    replicas     = var.replicas
    selector {
      match_labels = { app = "minio" }
    }
    template {
      metadata {
        labels = { app = "minio" }
      }
      spec {
        affinity {
          pod_anti_affinity {
            required_during_scheduling_ignored_during_execution {
              label_selector {
                match_labels = { app = "minio" }
              }
              topology_key = "kubernetes.io/hostname"
            }
          }
        }
        container {
          name  = "minio"
          image = "minio/minio:RELEASE.2025-01-20T14-49-07Z"
          args = [
            "server",
            # distributed mode: one volume per replica across the set
            "http://minio-{0...${var.replicas - 1}}.minio-headless.${var.namespace}.svc.cluster.local/data",
          ]
          env_from {
            secret_ref { name = kubernetes_secret.minio.metadata[0].name }
          }
          port { container_port = 9000 }
          resources {
            limits   = { memory = var.memory }
            requests = { memory = var.memory }
          }
          volume_mount {
            name       = "data"
            mount_path = "/data"
          }
        }
      }
    }
    volume_claim_template {
      metadata { name = "data" }
      spec {
        access_modes = ["ReadWriteOnce"]
        resources {
          requests = { storage = "1Gi" }
        }
      }
    }
  }
}

resource "kubernetes_service" "minio_headless" {
  metadata {
    name      = "minio-headless"
    namespace = var.namespace
  }
  spec {
    cluster_ip = "None"
    selector   = { app = "minio" }
    port {
      port = 9000
    }
  }
}

resource "kubernetes_service" "minio" {
  metadata {
    name      = "minio"
    namespace = var.namespace
  }
  spec {
    selector = { app = "minio" }
    port {
      port = 9000
    }
  }
}

output "endpoint" {
  value = "http://minio.${var.namespace}.svc.cluster.local:9000"
}
