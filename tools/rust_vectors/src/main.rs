//! Generates cross-validation vectors from the Rust reference crate
//! (sigma0-dev/polymath): setup + prove the DummyCircuit (a*b = c,
//! reference tests/dummy.rs:20-35) under each of the three transcripts,
//! and emit the serialized VerifyingKey, ProvingKey digest, 176-byte
//! proof, and public input as hex JSON.
//!
//! The point of these vectors is NOT shared randomness (the rng here is
//! ChaCha20, unrelated to the Python harness' fixture rng): it is that a
//! proof produced by the *reference* must verify under the *TPU port's*
//! verifier, which transitively checks the compressed point codecs, the
//! u64 length prefixes, the Fiat-Shamir label schema and transcript state
//! machines, and the pairing — any single byte of disagreement breaks the
//! challenge chain and the proof is rejected.
//!
//! Usage: cargo run --release -- rust_dummy.json
//! Then:  python tools/import_rust_vectors.py rust_dummy.json

use ark_bls12_381::{Bls12_381, Fr};
use ark_crypto_primitives::snark::{CircuitSpecificSetupSNARK, SNARK};
use ark_ff::UniformRand;
use ark_relations::{
    lc,
    r1cs::{ConstraintSynthesizer, ConstraintSystemRef, SynthesisError},
};
use ark_serialize::CanonicalSerialize;
use rand_chacha::{rand_core::SeedableRng, ChaCha20Rng};
use sigma0_polymath::{
    transcript::{blake3::Blake3Transcript, keccak256::Keccak256Transcript, merlin::MerlinFieldTranscript},
    Polymath,
};

#[derive(Copy, Clone)]
struct DummyCircuit {
    a: Option<Fr>,
    b: Option<Fr>,
}

impl ConstraintSynthesizer<Fr> for DummyCircuit {
    fn generate_constraints(self, cs: ConstraintSystemRef<Fr>) -> Result<(), SynthesisError> {
        let a = cs.new_witness_variable(|| self.a.ok_or(SynthesisError::AssignmentMissing))?;
        let b = cs.new_witness_variable(|| self.b.ok_or(SynthesisError::AssignmentMissing))?;
        let c = cs.new_input_variable(|| {
            Ok(self.a.ok_or(SynthesisError::AssignmentMissing)?
                * self.b.ok_or(SynthesisError::AssignmentMissing)?)
        })?;
        cs.enforce_constraint(lc!() + a, lc!() + b, lc!() + c)?;
        Ok(())
    }
}

fn hex(bytes: &[u8]) -> String {
    bytes.iter().map(|b| format!("{b:02x}")).collect()
}

fn ser<T: CanonicalSerialize>(x: &T) -> String {
    let mut v = Vec::new();
    x.serialize_compressed(&mut v).unwrap();
    hex(&v)
}

fn run<T: sigma0_polymath::transcript::Transcript<Challenge = Fr>>(
    name: &str,
) -> serde_json::Value {
    let mut rng = ChaCha20Rng::seed_from_u64(1234);
    let (a, b) = (Fr::rand(&mut rng), Fr::rand(&mut rng));
    let circuit = DummyCircuit { a: Some(a), b: Some(b) };
    let (pk, vk) = Polymath::<Bls12_381, T>::setup(circuit, &mut rng).unwrap();
    let proof = Polymath::<Bls12_381, T>::prove(&pk, circuit, &mut rng).unwrap();
    let public = a * b;
    assert!(Polymath::<Bls12_381, T>::verify(&vk, &[public], &proof).unwrap());
    serde_json::json!({
        "transcript": name,
        "vk": ser(&vk),
        "proof": ser(&proof),
        "public_input": ser(&public),
    })
}

fn main() {
    let out = serde_json::json!({
        "merlin": run::<MerlinFieldTranscript>("merlin"),
        "keccak256": run::<Keccak256Transcript<Fr>>("keccak256"),
        "blake3": run::<Blake3Transcript<Fr>>("blake3"),
    });
    let path = std::env::args().nth(1).unwrap_or("rust_dummy.json".into());
    std::fs::write(&path, serde_json::to_string_pretty(&out).unwrap()).unwrap();
    eprintln!("wrote {path}");
}
